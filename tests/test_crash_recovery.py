"""Hard-kill crash-recovery e2e (round-13 ask #4), tool-driven like
the A/B children: SIGKILL the whole child process group (driver + JVM)
while a staged write is in flight, restart from the checkpoint, and
require the final object trees across both mirrored sinks to be
byte-identical to a never-killed run — sync AND async progress modes.

Gated behind RIGATONI_CRASH_E2E=1 (it spawns 6 fresh JVMs, ~4-6 min):
run `RIGATONI_CRASH_E2E=1 pytest tests/test_crash_recovery.py` or the
tool directly (`python tools/crash_probe.py --out CRASH_E2E.json`) —
the committed CRASH_E2E_r13.json is a recorded run of exactly this.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RIGATONI_CRASH_E2E") != "1",
    reason="6 fresh-JVM children (~5 min); set RIGATONI_CRASH_E2E=1",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_mid_addbatch_restart_is_byte_identical():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "crash_probe.py"),
            "--modes",
            "sync,async",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [
        json.loads(ln)
        for ln in proc.stdout.splitlines()
        if ln.strip().startswith("{")
    ]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    modes = [r for r in lines if "mode" in r]
    assert {r["mode"] for r in modes} == {"sync", "async"}
    for r in modes:
        # the kill must have landed mid-addBatch (staging in flight,
        # ≥1 batch already committed) — a None kill_point means the
        # child finished before the harness caught it (vacuous run)
        assert r["kill_point"] is not None, r
        assert r["kill_point"]["trigger"] == "staging_in_flight"
        assert r["trees_match"] is True, r
