"""Interleaved streaming-throughput A/B (round-13 ask #1).

The round-12 driver bench read the streaming pipeline 4-6x slower than
round 11 at every batch size (batch-100 24.5K -> 4.0K events/s), but the
r12 A/B suite covered only the batch spine and the latency path.  This
harness settles streaming with the same protocol that adjudicated the
spine (BENCH_AB_r12 spine_ab) and the r7->r8 dispute:

- variant A = a git worktree at the round-11 final commit;
- variant B = the current checkout (HEAD);
- each pass spawns one fresh-JVM child per variant (tools/stream_probe.py
  with --repo, which inserts that root on sys.path before importing
  rigatoni_spark), order alternating pass to pass (A,B / B,A / ...);
- every child burns warmup streams, then times one stream per batch
  size, plus a repo-independent CONTROL aggregation so a steal burst
  that hits one child shows up in its control too;
- summary compares per-batch-size pass-mins, median-of-pass-mins, and
  the control-normalized ratio.

Usage:
  python tools/stream_ab.py --old-repo /tmp/wt_r11 [--passes 3] \
      [--batch-sizes 100,400,1600] [--out BENCH_AB_r13.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-repo", required=True)
    ap.add_argument("--old-name", default="r11_22d8c5f")
    ap.add_argument("--new-repo", default=here)
    ap.add_argument("--new-name", default="r13_head")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--batch-sizes", default="100,400,1600")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    child = os.path.join(here, "tools", "stream_probe.py")
    variants = {args.old_name: args.old_repo, args.new_name: args.new_repo}
    records: list[dict] = []

    for p in range(args.passes):
        order = list(variants.items())
        if p % 2 == 1:
            order.reverse()
        for name, repo in order:
            proc = subprocess.run(
                [
                    sys.executable,
                    child,
                    "--repo",
                    repo,
                    "--sf-dir",
                    args.sf_dir,
                    "--batch-sizes",
                    args.batch_sizes,
                    "--reps",
                    str(args.reps),
                    "--warmups",
                    str(args.warmups),
                ],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"child failed for {name}")
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    rec["variant"] = name
                    rec["pass"] = p
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    sizes = [int(s) for s in args.batch_sizes.split(",")]
    summary: dict = {}
    for bs in sizes:
        per_variant: dict = {}
        for name in variants:
            rows = [r for r in records if r["variant"] == name and r["batch"] == bs]
            pass_mins = [
                min(r["min_sec"] for r in rows if r["pass"] == p)
                for p in sorted({r["pass"] for r in rows})
            ]
            per_variant[name] = {
                "pass_mins": pass_mins,
                "median_of_pass_mins": round(statistics.median(pass_mins), 3),
                "min": min(pass_mins),
                "control_median": round(
                    statistics.median(r["control_sec"] for r in rows), 3
                ),
            }
        old, new = per_variant[args.old_name], per_variant[args.new_name]
        per_variant["new_over_old_median_ratio"] = round(
            new["median_of_pass_mins"] / old["median_of_pass_mins"], 3
        )
        per_variant["new_over_old_ctrl_normalized"] = round(
            (new["median_of_pass_mins"] / new["control_median"])
            / (old["median_of_pass_mins"] / old["control_median"]),
            3,
        )
        summary[str(bs)] = per_variant
    print(json.dumps({"summary": summary}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
