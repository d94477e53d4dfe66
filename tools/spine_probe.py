"""Interleaved A/B probe for the bench HEADLINE sections (round-9 ask:
settle the r7->r8 spine drop 99.3K -> 66.5K events/s).

The only runtime-relevant r7->r8 deltas on these paths (git diff
0d4ffad..4aae379) are (a) the spine's JSON writer gaining the
full-precision ``timestampFormat`` option (correctness-required: the
default truncates micros to millis, which the K3 read-back gate would
catch) and (b) the streaming DLQ wrapper (a Python try/except when no
dlq_dir is set). So the A/B alternates, in the SAME session on the
SAME draw:

- spine variant ``r8_micros_fmt``  — current writer;
- spine variant ``r7_default_fmt`` — the r7 writer (default millis
  format), toggled via ``writers._TEXT_TS_FMT = None``;
- one fixed CONTROL aggregation per pass (no write) to normalize
  hypervisor steal, the same protocol the round-8 A/B used for
  text_repetition_stats;
- the streaming pipeline (batch 400) interleaved between passes to
  band its run-to-run variance under the identical conditions.

Every run prints as a JSON line; the summary prints per-variant mins,
the steal-normalized ratio, and medians.

Usage: python tools/spine_probe.py [--sf-dir DIR] [--reps 6]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--skip-stream", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, here)
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from rigatoni_spark.config import (
        PartitionStrategy,
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.operators import dedup
    from rigatoni_spark.session import get_spark
    from rigatoni_spark.sinks import writers
    from rigatoni_spark.sinks.writers import write_batch
    from rigatoni_spark.sources.change_events import read_change_events
    from rigatoni_spark.streaming.pipeline import Pipeline

    spark = get_spark(app_name="spine_probe")
    read_change_events(spark, args.sf_dir).count()  # warm page cache
    n_in = read_change_events(spark, args.sf_dir).count()
    micros_fmt = writers._TEXT_TS_FMT

    def run_spine() -> float:
        out_dir = tempfile.mkdtemp(prefix="probe_spine_")
        try:
            t0 = time.monotonic()
            flowed = dedup.dedup_by_key(
                read_change_events(
                    spark,
                    args.sf_dir,
                    pipeline=[
                        {
                            "$match": {
                                "operationType": {
                                    "$in": [
                                        "insert",
                                        "update",
                                        "replace",
                                        "delete",
                                    ]
                                }
                            }
                        }
                    ],
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
        t0 = time.monotonic()
        (
            read_change_events(spark, args.sf_dir)
            .groupBy("operation", "collection")
            .agg(F.count(F.lit(1)), F.max("cluster_time"))
            .collect()
        )
        return time.monotonic() - t0

    table = pq.read_table(os.path.join(args.sf_dir, "events.parquet"))

    def run_stream(batch_size: int = 400) -> float:
        stream_root = tempfile.mkdtemp(prefix="probe_stream_")
        try:
            src = os.path.join(stream_root, "src")
            out = os.path.join(stream_root, "out")
            ckpt = os.path.join(stream_root, "ckpt")
            os.makedirs(src)
            n_chunks = 8
            step = (table.num_rows + n_chunks - 1) // n_chunks
            for i in range(n_chunks):
                pq.write_table(
                    table.slice(i * step, step),
                    os.path.join(src, f"{i:03d}.parquet"),
                )
            cfg = PipelineConfig(
                batch_timeout_secs=0.1,
                batch_size=batch_size,
                dedup_by_key=True,
            )
            sink = S3SinkConfig(
                bucket=out,
                format=SerializationFormat.JSON,
                partition_strategy=PartitionStrategy.DATE_HOUR_PARTITIONED,
                single_file_per_group=False,
            )
            p = Pipeline(spark, cfg, sink, src, ckpt).start()
            t0 = time.monotonic()
            p.process_all_available()
            sec = time.monotonic() - t0
            p.stop()
            return sec
        finally:
            shutil.rmtree(stream_root, ignore_errors=True)

    for _ in range(args.warmups):
        run_spine()
        if not args.skip_stream:
            run_stream()

    runs: dict[str, list[float]] = {
        "r8_micros_fmt": [],
        "r7_default_fmt": [],
        "control": [],
        "stream_b400": [],
    }
    for i in range(args.reps):
        # alternate which variant goes first so slow drift can't bias
        order = (
            ("r8_micros_fmt", "r7_default_fmt")
            if i % 2 == 0
            else ("r7_default_fmt", "r8_micros_fmt")
        )
        for variant in order:
            writers._TEXT_TS_FMT = (
                micros_fmt if variant == "r8_micros_fmt" else None
            )
            sec = run_spine()
            runs[variant].append(sec)
            print(
                json.dumps(
                    {"pass": i, "variant": variant, "sec": round(sec, 3)}
                ),
                flush=True,
            )
        writers._TEXT_TS_FMT = micros_fmt
        sec = run_control()
        runs["control"].append(sec)
        print(
            json.dumps({"pass": i, "variant": "control", "sec": round(sec, 3)}),
            flush=True,
        )
        if not args.skip_stream:
            sec = run_stream()
            runs["stream_b400"].append(sec)
            print(
                json.dumps(
                    {"pass": i, "variant": "stream_b400", "sec": round(sec, 3)}
                ),
                flush=True,
            )

    summary = {}
    for k, v in runs.items():
        if not v:
            continue
        summary[k] = {
            "runs": [round(x, 3) for x in v],
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
        }
    a, b = runs["r8_micros_fmt"], runs["r7_default_fmt"]
    summary["spine_overhead_min_ratio"] = round(min(a) / min(b), 3)
    summary["spine_overhead_median_ratio"] = round(
        statistics.median(a) / statistics.median(b), 3
    )
    summary["spine_eps_r8_min"] = round(n_in / min(a))
    summary["spine_eps_r7fmt_min"] = round(n_in / min(b))
    if runs["stream_b400"]:
        summary["stream_eps_min"] = round(
            table.num_rows / min(runs["stream_b400"])
        )
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
