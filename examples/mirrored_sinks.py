"""Beyond-reference: sink mirroring — one CDC stream fanned out to two
destinations in the same micro-batch: raw JSONL (replayable audit feed)
plus columnar Parquet (analytics), the lakehouse raw/curated split. The
primary sink's write job carries the probe; the mirror reuses its group
times, so the second destination costs one extra write job per batch
and both key sets share deterministic stems (replay-idempotent on both
sides at once)."""

from __future__ import annotations

import glob
import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.config import (
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.streaming.pipeline import Pipeline

    raw = S3SinkConfig(
        bucket=os.path.join(root, "raw"),
        format=SerializationFormat.JSON,
    )
    curated = S3SinkConfig(
        bucket=os.path.join(root, "curated"),
        format=SerializationFormat.PARQUET,
    )
    p = Pipeline(
        spark,
        PipelineConfig(batch_size=500, batch_timeout_secs=1.0),
        [raw, curated],
        event_feed(root, sf_dir),
        os.path.join(root, "ckpt"),
    ).start()
    p.process_all_available()
    stats = p.stop()

    raw_keys = [k for k in stats.keys_written if k.endswith(".jsonl")]
    cur_keys = [k for k in stats.keys_written if k.endswith(".parquet")]
    n_curated = (
        spark.read.parquet(
            *glob.glob(os.path.join(root, "curated", "**", "*.parquet"),
                       recursive=True)
        ).count()
    )
    print(
        f"processed={stats.events_processed} raw_objects={len(raw_keys)} "
        f"curated_objects={len(cur_keys)} curated_rows={n_curated}"
    )
    return {
        "events": stats.events_processed,
        "raw_keys": len(raw_keys),
        "curated_keys": len(cur_keys),
        "curated_rows": n_curated,
    }


if __name__ == "__main__":
    main(example_session("example_mirrored_sinks"), SF_DIR, workdir("ex_mirror_"))
