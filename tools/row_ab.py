"""Generic interleaved catalog-row A/B: old checkout vs HEAD.

One fresh-JVM child per (variant, pass), order alternating per pass;
each child times every requested row twice (min-of-2) plus an untouched
control row. The same steal-resistant protocol as tools/gate_ab.py /
stream_ab.py — single-shot numbers on this box swing up to 2x with
hypervisor steal, so only alternated same-session ratios are evidence.

Usage:
  python tools/row_ab.py --old-repo /tmp/wt_base \
      --queries text_lm_surprisal,text_lm_gate [--passes 3] [--out F]
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
repo, sf, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sys.path.insert(0, repo)
from rigatoni_spark.catalog import QUERIES
from rigatoni_spark.session import get_spark
spark = get_spark(app_name="row_ab_child")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = runs
print("ROW_AB " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-repo", required=True)
    ap.add_argument("--old-name", default="old")
    ap.add_argument("--new-repo", default=here)
    ap.add_argument("--new-name", default="head")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--control", default="dedup_minhash_lsh")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = [q for q in args.queries.split(",") if q]
    if args.control and args.control not in names:
        names.append(args.control)
    variants = {args.old_name: args.old_repo, args.new_name: args.new_repo}
    records: list[dict] = []
    for p in range(args.passes):
        order = list(variants.items())
        if p % 2 == 1:
            order.reverse()
        for vname, repo in order:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, repo, args.sf_dir,
                 ",".join(names)],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"child failed for {vname}")
            for line in proc.stdout.splitlines():
                if line.startswith("ROW_AB "):
                    rec = json.loads(line[len("ROW_AB "):])
                    rec.update({"variant": vname, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for vname in variants:
        runs = [r for r in records if r["variant"] == vname]
        summary[vname] = {
            q: {
                "per_pass_min": [min(r[q]) for r in runs],
                "median_of_mins": round(
                    statistics.median(min(r[q]) for r in runs), 3
                ),
                "min": round(min(min(r[q]) for r in runs), 3),
            }
            for q in names
        }
    old, new = summary[args.old_name], summary[args.new_name]
    for q in names:
        summary[f"{q}_new_over_old_median"] = round(
            new[q]["median_of_mins"] / max(old[q]["median_of_mins"], 1e-9), 3
        )
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
