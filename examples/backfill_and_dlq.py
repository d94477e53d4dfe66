"""Beyond-reference operability: one-shot backfill of an archived feed
(trigger(availableNow) — drains everything once, same deterministic
keys as the continuous trigger, then terminates), a dead-letter queue
(a batch that exhausts its write retries lands under
dlq_dir/query=<scope>/batch_id=N and the stream keeps running), and
the DLQ's operational other half: after the destination heals,
``Pipeline.replay_dlq()`` re-drives every parked batch through the
real sink path with the same deterministic keys and clears the
entries — the final object set equals a run that never failed."""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.config import PipelineConfig, S3SinkConfig, SerializationFormat
    from rigatoni_spark.streaming import pipeline as P
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

    # --- poison a batch to show the DLQ + replay loop -------------------
    real = P.write_batch

    def denied(df, cfg, batch_id=None, **kw):
        raise RuntimeError("access denied by destination")

    feed2 = event_feed(os.path.join(root, "second"), sf_dir)
    p2 = Pipeline(
        spark,
        PipelineConfig(backfill=True, max_retries=1),
        S3SinkConfig(
            bucket=os.path.join(root, "out2"),
            format=SerializationFormat.JSON,
        ),
        feed2,
        os.path.join(root, "ckpt2"),
        dlq_dir=os.path.join(root, "dlq2"),
    )
    P.write_batch = denied
    try:
        p2.start()
        s2 = p2.await_backfill()
    finally:
        P.write_batch = real
    print(f"poisoned run parked {s2.dlq_events} events in the DLQ")
    keys = p2.replay_dlq()  # destination healed: re-drive + clear
    print(
        f"replay restored {p2.stats.dlq_replayed_events} events -> "
        f"{len(keys)} objects; dlq now empty"
    )
    return {
        "events": stats.events_processed,
        "dlq": stats.dlq_events,
        "parked": s2.dlq_events,
        "replayed": p2.stats.dlq_replayed_events,
        "replay_keys": len(keys),
    }


if __name__ == "__main__":
    main(example_session("example_backfill"), SF_DIR, workdir("ex_backfill_"))
