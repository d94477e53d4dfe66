"""Interleaved async-progress-tracking latency A/B (round-11 ask #1).

Same protocol as tools/latency_ab.py — one fresh-JVM child per variant
per pass, order alternating — but both variants run the SAME checkout
(HEAD); the treatment is the PipelineConfig.async_progress_tracking
knob at the production config (batch 500 / 50 ms / feed 0.4 s).

Control vs treatment: addBatch is OUR foreachBatch body and runs
byte-identical code in both variants, so its delta measures the steal
band, not the knob. The knob's effect shows in walCommit +
commitOffsets (should collapse to ~0 under async) and in the
end-to-end p50/p99.

Usage:
  python tools/async_ab.py [--passes 3] [--out LATENCY_AB_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import sys, os, json
sys.path.insert(0, sys.argv[1])
import pyarrow.parquet as pq
import bench
from rigatoni_spark.session import get_spark
spark = get_spark(app_name="async_ab_child")
table = pq.read_table(os.path.join(sys.argv[2], "events.parquet"))
r = bench.measure_latency(spark, table, 500, 0.05, n_files=16,
                          feed_interval=0.4,
                          async_progress=sys.argv[3] == "async")
print("ASYNC_AB " + json.dumps(r))
spark.stop()
"""


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=here)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    records: list[dict] = []
    for p in range(args.passes):
        order = ["sync", "async"]
        if p % 2 == 1:
            order.reverse()
        for name in order:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, args.repo, args.sf_dir, name],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"child failed for {name}")
            for line in proc.stdout.splitlines():
                if line.startswith("ASYNC_AB "):
                    rec = json.loads(line[len("ASYNC_AB "):])
                    rec.update({"variant": name, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for name in ("sync", "async"):
        runs = [r for r in records if r["variant"] == name]

        def med(key):
            vals = [r["trigger_durationMs_median"].get(key) for r in runs]
            vals = [v for v in vals if v is not None]
            return round(statistics.median(vals), 1) if vals else None

        summary[name] = {
            "p50_ms": [r["p50_ms"] for r in runs],
            "p50_median": statistics.median(r["p50_ms"] for r in runs),
            "p50_min": min(r["p50_ms"] for r in runs),
            "p99_ms": [r["p99_ms"] for r in runs],
            "addBatch_median_control": med("addBatch"),
            "walCommit_median": med("walCommit"),
            "commitOffsets_median": med("commitOffsets"),
            "latestOffset_median": med("latestOffset"),
            "trigger_median": med("triggerExecution"),
        }
    s, a = summary["sync"], summary["async"]
    summary["p50_async_over_sync"] = round(
        a["p50_median"] / s["p50_median"], 3
    )
    summary["control_async_over_sync"] = round(
        a["addBatch_median_control"] / s["addBatch_median_control"], 3
    )
    offsets_sync = (s["walCommit_median"] or 0) + (
        s["commitOffsets_median"] or 0
    )
    offsets_async = (a["walCommit_median"] or 0) + (
        a["commitOffsets_median"] or 0
    )
    summary["offset_metadata_ms_sync_vs_async"] = [
        offsets_sync,
        offsets_async,
    ]
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
