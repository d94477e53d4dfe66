"""Streaming-throughput probe: time the bench's streaming pipeline at
chosen batch sizes, printing every run (not just the min) so a
regression can be separated from hypervisor-steal noise.

Usage:
  python tools/stream_probe.py [--sf-dir DIR] [--batch-sizes 100,400]
                               [--reps 3] [--repo ROOT]

`--repo` lets the same probe file drive an older checkout (bisecting):
the probe inserts that root on sys.path before importing
rigatoni_spark.
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
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batch-sizes", default="100,400")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--repo", default=here)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import pyarrow.parquet as pq

    from rigatoni_spark.config import (
        PartitionStrategy,
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.session import get_spark
    from rigatoni_spark.streaming.pipeline import Pipeline

    spark = get_spark(app_name="stream_probe")
    table = pq.read_table(os.path.join(args.sf_dir, "events.parquet"))

    def run_control() -> float:
        # Repo-independent steal sentinel: same plan regardless of which
        # checkout's rigatoni_spark is on sys.path.
        t0 = time.monotonic()
        (
            spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
            .groupBy("event_type")
            .count()
            .collect()
        )
        return time.monotonic() - t0

    def run_stream(batch_size: int) -> float:
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
                batch_timeout_secs=0.1, batch_size=batch_size, dedup_by_key=True
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

    sizes = [int(s) for s in args.batch_sizes.split(",")]
    for _ in range(args.warmups):
        run_stream(sizes[-1])
    ctrl = round(run_control(), 3)
    out: dict[str, dict] = {}
    for bs in sizes:
        runs = [round(run_stream(bs), 3) for _ in range(args.reps)]
        out[str(bs)] = {
            "runs": runs,
            "min_sec": min(runs),
            "eps_min": round(table.num_rows / min(runs)),
            "control_sec": ctrl,
        }
        print(json.dumps({"repo": args.repo, "batch": bs, **out[str(bs)]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
