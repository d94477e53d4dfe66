"""Watch levels + mid-stream collection discovery — the Spark twin of
the reference's database_watching example (rigatoni-examples/
database_watching.rs): DATABASE level watches everything under one
query; COLLECTION level fans one isolated query (own checkpoint) per
collection; collections appearing mid-stream surface in the
active-collections gauge (pipeline.rs:1344-1353 parity)."""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.config import (
        PipelineConfig,
        S3SinkConfig,
        SerializationFormat,
        WatchLevel,
    )
    from rigatoni_spark.streaming.pipeline import Pipeline

    feed = event_feed(root, sf_dir)
    out = {}
    for label, cfg in {
        "database": PipelineConfig(watch_level=WatchLevel.DATABASE),
        "collections": PipelineConfig(
            watch_level=WatchLevel.COLLECTION, collections=["c0", "c1"]
        ),
    }.items():
        sink = S3SinkConfig(
            bucket=os.path.join(root, label),
            format=SerializationFormat.JSON,
        )
        p = Pipeline(
            spark, cfg, sink, feed, os.path.join(root, f"ckpt_{label}")
        ).start()
        p.process_all_available()
        stats = p.stop()
        print(f"{label}: {stats.events_processed} events")
        out[label] = stats.events_processed
    return out


if __name__ == "__main__":
    main(example_session("example_watching"), SF_DIR, workdir("ex_watch_"))
