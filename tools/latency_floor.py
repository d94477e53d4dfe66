"""Bare-engine trigger floor vs the direct-write path (round-13 ask #2
"Done=" decomposition): at the production config (batch 500 / 50 ms /
feed 0.4 s), what does a trigger cost when the foreachBatch body does
NOTHING — no probe, no write, no Spark action? That floor is Spark's
micro-batch machinery + py4j dispatch + source listing: the part of
addBatch no sink design can remove.

One fresh-JVM child per variant per pass, alternated (the A/B
protocol): `floor` monkeypatches Pipeline._foreach_batch to a no-op
and reports Spark's trigger durationMs medians; `direct` runs the real
direct-write sink through bench.measure_latency. The honest claim is
direct's addBatch MINUS the floor's addBatch = the irreducible
residual our write path still pays.

Usage: python tools/latency_floor.py [--passes 2] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_FLOOR_CHILD = r"""
import sys, os, json, time, tempfile, shutil
sys.path.insert(0, sys.argv[1])
import pyarrow.parquet as pq
from rigatoni_spark.config import (PipelineConfig, S3SinkConfig,
                                   SerializationFormat, PartitionStrategy)
from rigatoni_spark.session import get_spark
import rigatoni_spark.streaming.pipeline as pipeline_mod

spark = get_spark(app_name="latency_floor_child")
# a cheap body finishes well inside the trigger interval, so idle
# triggers flood the default 100-entry recentProgress ring; keep
# enough history to find the data triggers
spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
table = pq.read_table(os.path.join(sys.argv[2], "events.parquet"))
uniq = table.set_column(table.schema.get_field_index("user_id"),
                        "user_id", table.column("event_id"))

mode = sys.argv[3]
if mode == "noop":
    # zero Spark actions, zero py4j beyond the dispatch: the bare
    # engine trigger floor (NOTE: the batch plan never executes, so
    # progress reports numInputRows=0 — batches are identified by
    # batchId, not row counts)
    body = lambda self, df, bid, state=None: None
else:
    # execute the batch plan (scan + envelope transform + dedup) but
    # write nothing: floor + OUR data plan, no sink
    body = lambda self, df, bid, state=None: df.count()
pipeline_mod.Pipeline._foreach_batch = body

root = tempfile.mkdtemp(prefix="lat_floor_")
try:
    src = os.path.join(root, "src"); os.makedirs(src)
    cfg = PipelineConfig(batch_timeout_secs=0.05, batch_size=500,
                         dedup_by_key=True)
    sink = S3SinkConfig(bucket=os.path.join(root, "out"),
                        format=SerializationFormat.JSON,
                        partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
                        single_file_per_group=False)
    p = pipeline_mod.Pipeline(spark, cfg, sink, src, os.path.join(root, "ckpt")).start()
    def feed(i):
        tmp = os.path.join(root, f"t{i}.parquet")
        pq.write_table(uniq.slice(i * 500, 500), tmp)
        os.rename(tmp, os.path.join(src, f"{i:04d}.parquet"))
    for i in range(2):
        feed(i)
    p.process_all_available()
    for i in range(2, 18):
        feed(i); time.sleep(0.4)
    p.process_all_available()
    # first progress entry per batchId = the data trigger (idle
    # triggers re-report the last batchId); skip batches 0-1 (cold)
    dur, seen = {}, set()
    for q in p._queries:
        for pr in (q.recentProgress or []):
            bid = pr.get("batchId")
            if bid in seen or bid is None or bid < 2:
                continue
            seen.add(bid)
            for k, v in (pr.get("durationMs") or {}).items():
                dur.setdefault(k, []).append(v)
    med = {k: sorted(v)[len(v)//2] for k, v in dur.items() if v}
    print("FLOOR " + json.dumps(
        {"trigger_durationMs_median": med, "n_batches": len(seen)}))
    p.stop()
finally:
    shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""

_DIRECT_CHILD = r"""
import sys, os, json
sys.path.insert(0, sys.argv[1])
import pyarrow.parquet as pq
import bench
from rigatoni_spark.session import get_spark
spark = get_spark(app_name="latency_floor_direct_child")
table = pq.read_table(os.path.join(sys.argv[2], "events.parquet"))
r = bench.measure_latency(spark, table, 500, 0.05, n_files=16,
                          feed_interval=0.4, direct_write=True)
print("FLOOR " + json.dumps(r))
spark.stop()
"""


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=here)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    children = {
        "floor_noop": (_FLOOR_CHILD, "noop"),
        "floor_count": (_FLOOR_CHILD, "count"),
        "direct": (_DIRECT_CHILD, "-"),
    }
    records: list[dict] = []
    names = list(children)
    for p in range(args.passes):
        order = names[p % len(names):] + names[: p % len(names)]
        for name in order:
            code, mode = children[name]
            proc = subprocess.run(
                [sys.executable, "-c", code, args.repo, args.sf_dir, mode],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"child failed for {name}")
            for line in proc.stdout.splitlines():
                if line.startswith("FLOOR "):
                    rec = json.loads(line[len("FLOOR "):])
                    rec.update({"variant": name, "pass": p})
                    records.append(rec)
                    print(json.dumps(rec), flush=True)

    summary: dict = {}
    for name in children:
        runs = [r for r in records if r["variant"] == name]

        def med(key):
            vals = [r["trigger_durationMs_median"].get(key) for r in runs]
            vals = [v for v in vals if v is not None]
            return round(statistics.median(vals), 1) if vals else None

        summary[name] = {
            "addBatch_median": med("addBatch"),
            "walCommit_median": med("walCommit"),
            "commitOffsets_median": med("commitOffsets"),
            "latestOffset_median_control": med("latestOffset"),
            "trigger_median": med("triggerExecution"),
        }
    fn = summary["floor_noop"]["addBatch_median"]
    fc = summary["floor_count"]["addBatch_median"]
    d = summary["direct"]["addBatch_median"]
    if None not in (fn, fc, d):
        summary["decomposition_ms"] = {
            "engine_dispatch_floor": fn,
            "data_plan_execution": round(fc - fn, 1),
            "serialize_plus_write": round(d - fc, 1),
            "direct_addBatch_total": d,
        }
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            for rec in records:
                fh.write(json.dumps(rec) + "\n")
            fh.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
