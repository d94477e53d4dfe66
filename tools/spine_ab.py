"""Interleaved r9-vs-r10 spine A/B (round-11 ask #1).

The round-10 driver bench read the headline spine at 62.4K events/s vs
round 9's 102.7K — a uniform band shift across 60+ unrelated queries
(the documented hypervisor-steal signature), but with no r9-vs-r10
interleaved evidence at spine level.  This harness closes that gap with
the same protocol that settled r7->r8 (BENCH_AB_r09.json):

- variant A = a git worktree at the round-9 final commit;
- variant B = the current checkout (HEAD);
- each pass spawns one fresh-JVM child per variant (tools/spine_child.py),
  order alternating pass to pass (A,B / B,A / A,B ...), each child burning
  two in-process warmup spines before its timed reps;
- every child also times a repo-independent CONTROL aggregation so a
  steal burst that hits one child shows up in its control too;
- summary compares per-variant pass-mins, median-of-pass-mins, and the
  control-normalized ratio.

Usage:
  python tools/spine_ab.py --old-repo /tmp/wt_r9 [--passes 3] \
      [--out BENCH_AB_r11.json]
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
    ap.add_argument("--old-name", default="r9_94549dd")
    ap.add_argument("--new-repo", default=here)
    ap.add_argument("--new-name", default="r10_head")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    child = os.path.join(here, "tools", "spine_child.py")
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
                    "--variant",
                    name,
                    "--sf-dir",
                    args.sf_dir,
                    "--reps",
                    str(args.reps),
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
                    rec["pass"] = p
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for name in variants:
        runs = [r for r in records if r["variant"] == name]
        pass_mins = [
            min(r["spine_sec"] for r in runs if r["pass"] == p)
            for p in sorted({r["pass"] for r in runs})
        ]
        ctrl = [r["control_sec"] for r in runs]
        summary[name] = {
            "spine_runs": [r["spine_sec"] for r in runs],
            "pass_mins": pass_mins,
            "min": min(r["spine_sec"] for r in runs),
            "median_of_pass_mins": round(statistics.median(pass_mins), 3),
            "control_runs": ctrl,
            "control_median": round(statistics.median(ctrl), 3),
        }
    old, new = summary[args.old_name], summary[args.new_name]
    summary["new_over_old_min_ratio"] = round(new["min"] / old["min"], 3)
    summary["new_over_old_median_ratio"] = round(
        new["median_of_pass_mins"] / old["median_of_pass_mins"], 3
    )
    # steal-normalized: divide each variant's spine median by its own
    # control median before comparing
    summary["new_over_old_ctrl_normalized"] = round(
        (new["median_of_pass_mins"] / new["control_median"])
        / (old["median_of_pass_mins"] / old["control_median"]),
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
