"""Interleaved direct-write + async latency A/B (round-13 ask #2).

Same protocol as tools/async_ab.py — one fresh-JVM child per variant
per pass, order rotating — all variants run the SAME checkout (HEAD);
the treatments are the S3SinkConfig.direct_write knob (task-side
final-key writes: no staging, no DataFrameWriter commit protocol, no
rename walk) and PipelineConfig.async_progress_tracking, at the
production config (batch 500 / 50 ms / feed 0.4 s).

Variants:
  sync_staged   — the r12 headline path (baseline)
  sync_direct   — direct write, sync progress
  async_direct  — direct write + async progress (the full stack)

Controls: latestOffset + walCommit (sync variants) run identical code
across variants — their drift measures the steal band. The direct
knob's effect shows in addBatch; the async knob's in
walCommit+commitOffsets; the product in end-to-end p50/p99.

Usage:
  python tools/direct_ab.py [--passes 3] [--out LATENCY_AB_r13.json]
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
spark = get_spark(app_name="direct_ab_child")
table = pq.read_table(os.path.join(sys.argv[2], "events.parquet"))
variant = sys.argv[3]
r = bench.measure_latency(spark, table, 500, 0.05, n_files=16,
                          feed_interval=0.4,
                          async_progress="async" in variant,
                          direct_write="direct" in variant)
print("DIRECT_AB " + json.dumps(r))
spark.stop()
"""

VARIANTS = ["sync_staged", "sync_direct", "async_direct"]


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
        # rotate the order so every variant visits every slot
        order = VARIANTS[p % len(VARIANTS):] + VARIANTS[: p % len(VARIANTS)]
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
                if line.startswith("DIRECT_AB "):
                    rec = json.loads(line[len("DIRECT_AB "):])
                    rec.update({"variant": name, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for name in VARIANTS:
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
            "addBatch_median": med("addBatch"),
            "walCommit_median": med("walCommit"),
            "commitOffsets_median": med("commitOffsets"),
            "latestOffset_median_control": med("latestOffset"),
            "trigger_median": med("triggerExecution"),
        }
    base = summary["sync_staged"]
    for name in VARIANTS[1:]:
        v = summary[name]
        summary[f"p50_{name}_over_sync_staged"] = round(
            v["p50_median"] / base["p50_median"], 3
        )
        summary[f"addBatch_{name}_over_sync_staged"] = round(
            v["addBatch_median"] / base["addBatch_median"], 3
        )
        if v["latestOffset_median_control"] and base["latestOffset_median_control"]:
            summary[f"control_{name}_over_sync_staged"] = round(
                v["latestOffset_median_control"]
                / base["latestOffset_median_control"],
                3,
            )
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
