"""Prometheus metrics surface — the Spark twin of the reference's
metrics_prometheus example (rigatoni-examples/metrics_prometheus.rs):
run a pipeline, then render the rigatoni_* metric families in
Prometheus text exposition format (scrape-ready; bind it behind any
HTTP handler)."""

from __future__ import annotations

import os

from _common import SF_DIR, event_feed, example_session, workdir


def main(spark, sf_dir: str, root: str) -> str:
    from rigatoni_spark.config import PipelineConfig, S3SinkConfig, SerializationFormat
    from rigatoni_spark.streaming.pipeline import Pipeline

    sink = S3SinkConfig(
        bucket=os.path.join(root, "out"), format=SerializationFormat.JSON
    )
    p = Pipeline(
        spark, PipelineConfig(), sink, event_feed(root, sf_dir),
        os.path.join(root, "ckpt")
    ).start()
    p.process_all_available()
    p.stop()
    text = p.metrics.render_prometheus()
    print(text)
    return text


if __name__ == "__main__":
    main(example_session("example_metrics"), SF_DIR, workdir("ex_metrics_"))
