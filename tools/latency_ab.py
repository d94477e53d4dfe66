"""Interleaved latency A/B at the production config (round-11 ask #2).

Same protocol as tools/spine_ab.py: one fresh-JVM child per variant
per pass, order alternating, each child running bench.measure_latency
(batch 500 / 50 ms / feed 0.4 s) from its own checkout. The engine-
fixed durationMs components (walCommit / commitOffsets / latestOffset)
act as in-child steal controls: they run identical code in both
variants, so any band shift shows up there and the honest signal is
the VARIANT delta in addBatch minus the CONTROL delta.

Usage:
  python tools/latency_ab.py --old-repo /tmp/wt_prelat \
      [--passes 3] [--out LATENCY_AB_r11.json]
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
spark = get_spark(app_name="latency_ab_child")
table = pq.read_table(os.path.join(sys.argv[2], "events.parquet"))
r = bench.measure_latency(spark, table, 500, 0.05, n_files=16, feed_interval=0.4)
print("LAT_AB " + json.dumps(r))
spark.stop()
"""


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-repo", required=True)
    ap.add_argument("--old-name", default="pre_cut")
    ap.add_argument("--new-repo", default=here)
    ap.add_argument("--new-name", default="head")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    variants = {args.old_name: args.old_repo, args.new_name: args.new_repo}
    records: list[dict] = []
    for p in range(args.passes):
        order = list(variants.items())
        if p % 2 == 1:
            order.reverse()
        for name, repo in order:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, repo, args.sf_dir],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"child failed for {name}")
            for line in proc.stdout.splitlines():
                if line.startswith("LAT_AB "):
                    rec = json.loads(line[len("LAT_AB "):])
                    rec.update({"variant": name, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for name in variants:
        runs = [r for r in records if r["variant"] == name]

        def med(key):
            vals = [r["trigger_durationMs_median"].get(key) for r in runs]
            vals = [v for v in vals if v is not None]
            return round(statistics.median(vals), 1) if vals else None

        summary[name] = {
            "p50_ms": [r["p50_ms"] for r in runs],
            "p50_median": statistics.median(r["p50_ms"] for r in runs),
            "addBatch_median": med("addBatch"),
            "trigger_median": med("triggerExecution"),
            "engine_fixed_control": round(
                sum(med(k) or 0 for k in ("walCommit", "commitOffsets", "latestOffset")), 1
            ),
        }
    old, new = summary[args.old_name], summary[args.new_name]
    summary["addBatch_new_over_old"] = round(
        new["addBatch_median"] / old["addBatch_median"], 3
    )
    summary["control_new_over_old"] = round(
        new["engine_fixed_control"] / old["engine_fixed_control"], 3
    )
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
