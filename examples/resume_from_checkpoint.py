"""Restart/resume semantics — the Spark stand-in for the reference's
multi_instance_redis example (rigatoni-examples/multi_instance_redis.rs):
the reference coordinates multiple instances through a shared Redis
resume-token store; here the Spark checkpoint WAL carries the same
contract — a restarted pipeline resumes where the last committed batch
left off and replays nothing at the sink (deterministic keys make any
at-least-once replay overwrite identical objects)."""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> dict:
    from rigatoni_spark.config import PipelineConfig, S3SinkConfig, SerializationFormat
    from rigatoni_spark.streaming.pipeline import Pipeline

    sink = S3SinkConfig(
        bucket=os.path.join(root, "out"), format=SerializationFormat.JSON
    )
    ckpt = os.path.join(root, "ckpt")
    feed = event_feed(root, sf_dir)
    first = Pipeline(spark, PipelineConfig(), sink, feed, ckpt).start()
    first.process_all_available()
    s1 = first.stop()
    # "another instance" attaches to the same checkpoint: nothing replays
    second = Pipeline(spark, PipelineConfig(), sink, feed, ckpt).start()
    second.process_all_available()
    s2 = second.stop()
    print(f"first run: {s1.events_processed}, resumed run: {s2.events_processed}")
    return {"first": s1.events_processed, "resumed": s2.events_processed}


if __name__ == "__main__":
    main(example_session("example_resume"), SF_DIR, workdir("ex_resume_"))
