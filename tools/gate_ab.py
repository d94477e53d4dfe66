"""Interleaved text_lm_gate A/B (round-11 ask #6).

The driver's round-11 run read text_lm_gate 1.70x slower while
text_lm_surprisal improved 0.64x — the suspected cause is the
cache-lifecycle fix (d1c9fd0): r10's never-unpersisted gram caches let
the gate free-ride on a previous query's cache while taxing unrelated
queries. This pins the attribution: one fresh-JVM child per (variant,
pass), order alternating, each child timing text_lm_gate +
text_lm_surprisal TWICE and reporting both runs separately — run1 is
the honest cold figure; run2 exposes the leak (pre-fix, a second run
free-rides on the first run's never-unpersisted gram caches, which is
exactly the subsidy the fix removed) — plus text_quality_logit as an
untouched-code control.

Usage:
  python tools/gate_ab.py --old-repo /tmp/wt_prelm \
      [--passes 3] [--out BENCH_AB_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import sys, time, json
repo, sf = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
from rigatoni_spark.catalog import QUERIES
from rigatoni_spark.session import get_spark
spark = get_spark(app_name="gate_ab_child")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in ("text_lm_gate", "text_lm_surprisal", "text_quality_logit"):
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = runs  # [cold run1, warm run2] - run2 exposes leaks
print("GATE_AB " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-repo", required=True)
    ap.add_argument("--old-name", default="pre_fix")
    ap.add_argument("--new-repo", default=here)
    ap.add_argument("--new-name", default="head")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
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
                if line.startswith("GATE_AB "):
                    rec = json.loads(line[len("GATE_AB "):])
                    rec.update({"variant": name, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    queries = ("text_lm_gate", "text_lm_surprisal", "text_quality_logit")
    for name in variants:
        runs = [r for r in records if r["variant"] == name]
        summary[name] = {
            q: {
                "run1_cold": [r[q][0] for r in runs],
                "run2_warm": [r[q][1] for r in runs],
                "run1_median": round(
                    statistics.median(r[q][0] for r in runs), 3
                ),
                "run2_median": round(
                    statistics.median(r[q][1] for r in runs), 3
                ),
            }
            for q in queries
        }
    old, new = summary[args.old_name], summary[args.new_name]
    for q in queries:
        summary[f"{q}_cold_new_over_old"] = round(
            new[q]["run1_median"] / old[q]["run1_median"], 3
        )
        summary[f"{q}_warm_over_cold_old"] = round(
            old[q]["run2_median"] / old[q]["run1_median"], 3
        )
        summary[f"{q}_warm_over_cold_new"] = round(
            new[q]["run2_median"] / new[q]["run1_median"], 3
        )
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
