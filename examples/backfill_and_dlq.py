"""Beyond-reference operability: one-shot backfill of an archived feed
(trigger(availableNow) — drains everything once, same deterministic
keys as the continuous trigger, then terminates) and a dead-letter
queue (a batch that exhausts its write retries lands under
dlq_dir/batch_id=N and the stream keeps running)."""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.config import PipelineConfig, S3SinkConfig, SerializationFormat
    from rigatoni_spark.streaming.pipeline import Pipeline

    sink = S3SinkConfig(
        bucket=os.path.join(root, "out"), format=SerializationFormat.JSON
    )
    p = Pipeline(
        spark,
        PipelineConfig(backfill=True),
        sink,
        event_feed(root, sf_dir),
        os.path.join(root, "ckpt"),
        dlq_dir=os.path.join(root, "dlq"),
    ).start()
    stats = p.await_backfill()
    print(
        f"backfill drained {stats.events_processed} events in "
        f"{stats.batches_written} batches; dlq={stats.dlq_events}"
    )
    return {"events": stats.events_processed, "dlq": stats.dlq_events}


if __name__ == "__main__":
    main(example_session("example_backfill"), SF_DIR, workdir("ex_backfill_"))
