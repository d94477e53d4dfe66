"""One-variant child for the r9-vs-r10 spine A/B (tools/spine_ab.py).

Runs the bench.py headline spine (filter -> dedup -> serialize ->
partitioned JSON write at sf0.1) against whichever repo checkout
``--repo`` points at, plus a repo-independent CONTROL aggregation to
normalize hypervisor steal.  Prints one JSON line per rep:

    {"variant": ..., "rep": i, "spine_sec": s, "control_sec": c}

The parent alternates child invocations (A,B,A,B,...) so each pass of
the two variants shares the same steal band; each child is a fresh JVM
so neither variant inherits the other's JIT warmth (two warmup spine
runs are burned in-process before the timed reps, mirroring bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--variant", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warmups", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from pyspark.sql import functions as F

    from rigatoni_spark.config import (
        PartitionStrategy,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.operators import dedup
    from rigatoni_spark.session import get_spark
    from rigatoni_spark.sinks.writers import write_batch
    from rigatoni_spark.sources.change_events import read_change_events

    spark = get_spark(app_name=f"spine_ab_{args.variant}")
    # warm page cache + JVM outside timed regions (same as bench.py)
    read_change_events(spark, args.sf_dir).count()
    events_raw = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    events_raw.count()

    def run_spine() -> float:
        out_dir = tempfile.mkdtemp(prefix="spine_ab_")
        try:
            t0 = time.monotonic()
            flowed = dedup.dedup_by_key(
                read_change_events(
                    spark,
                    args.sf_dir,
                    pipeline=[{"$match": {"operationType": {"$in": ["insert", "update", "replace", "delete"]}}}],
                )
            )
            write_batch(
                flowed,
                S3SinkConfig(
                    bucket=out_dir,
                    format=SerializationFormat.JSON,
                    partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
                    single_file_per_group=False,
                ),
                batch_id=0,
            )
            return time.monotonic() - t0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def run_control() -> float:
        # repo-independent steal normalizer: raw-pyspark agg, no sink
        t0 = time.monotonic()
        (
            events_raw.groupBy("event_type")
            .agg(F.count("*"), F.avg("value"), F.approx_count_distinct("user_id"))
            .collect()
        )
        return time.monotonic() - t0

    for _ in range(args.warmups):
        run_spine()
    run_control()

    for i in range(args.reps):
        s = run_spine()
        c = run_control()
        print(
            json.dumps(
                {
                    "variant": args.variant,
                    "rep": i,
                    "spine_sec": round(s, 3),
                    "control_sec": round(c, 3),
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
