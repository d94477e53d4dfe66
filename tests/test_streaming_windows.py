"""Streaming event-time operators (beyond-reference, SURVEY.md §2.4):
tumbling windows under watermark and bounded-state dedup, driven through
a memory-sink streaming query to completion."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rigatoni_spark.operators.batching import windowed_counts
from rigatoni_spark.operators.dedup import dedup_stream_within_watermark
from rigatoni_spark.sources.change_events import read_change_events_stream

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def _feed_all(src: str) -> None:
    pq.write_table(pq.read_table(SF_EVENTS), os.path.join(src, "all.parquet"))


class TestEventTimeWindows:
    def test_windowed_counts_streaming_matches_batch(self, spark, change_events, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _feed_all(str(src))
        stream = read_change_events_stream(spark, str(src))
        agg = (
            stream.withWatermark("cluster_time", "1 hour")
            .groupBy(
                F.window("cluster_time", "1 hour").alias("w"), "collection"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"), "collection", "n_events"
            )
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_out")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["window_start"], r["collection"]): r["n_events"]
                for r in spark.sql("SELECT * FROM win_out").collect()
            }
        finally:
            q.stop()
        want = {
            (r["window_start"], r["collection"]): r["n_events"]
            for r in windowed_counts(change_events, "1 hour")
            .select("window_start", "collection", "n_events")
            .collect()
        }
        assert got == want

    def test_watermark_dedup_bounded_state(self, spark, change_events, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _feed_all(str(src))
        stream = read_change_events_stream(spark, str(src))
        deduped = dedup_stream_within_watermark(
            stream, key_cols=["collection", "document_key"], delay="10 minutes"
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .start()
        )
        try:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) c FROM dedup_out").collect()[0]["c"]
        finally:
            q.stop()
        total = change_events.count()
        uniques = change_events.select("collection", "document_key").distinct().count()
        # dedup removed something, and never below the true distinct count
        assert uniques <= n < total

    def test_session_window_streaming(self, spark, tmp_path):
        """session_window(gap) — the streaming sibling of
        operators.advanced.sessionize."""
        src = tmp_path / "src"
        src.mkdir()
        _feed_all(str(src))
        stream = read_change_events_stream(spark, str(src))
        sess = (
            stream.withWatermark("cluster_time", "2 hours")
            .groupBy(
                F.session_window("cluster_time", "30 minutes").alias("sw"),
                F.col("document_key"),
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            sess.writeStream.outputMode("complete")
            .format("memory")
            .queryName("sess_out")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT count(*) c, sum(n_events) s FROM sess_out"
            ).collect()[0]
        finally:
            q.stop()
        assert rows["s"] == 1000  # every event lands in exactly one session
        assert rows["c"] > 0
