"""Continuously-maintained materialized view of the replicated data.

The reference replicates the change log to S3 and stops; its consumers
then rebuild current state themselves. This closes that loop: a
streaming query folds the change stream into a queryable current-state
parquet table (insert/replace/update upsert, delete removes the key).

Dataflow per micro-batch:

    change stream -> materialize_stream (applyInPandasWithState:
      one (version, op, doc) struct per key, emits only changed keys)
    -> foreachBatch MERGE into the snapshot table
    -> atomic directory swap

Scale notes:
- the per-batch merge unions the current snapshot with the (small)
  delta and re-winnows by max version — at 100 TB the swap-directory
  snapshot becomes a Delta/Iceberg table and the merge a keyed MERGE
  INTO (partition-pruned, touches only changed partitions); the
  dataflow shape is identical.
- state size tracks the live key set (not log length); RocksDB state
  store holds it off-heap on a cluster.
- the merge re-uses the same max_by winnow as operators/materialize.py,
  so replayed batches (at-least-once delivery) are no-ops — idempotent
  view maintenance.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rigatoni_spark.operators.materialize import SNAPSHOT_COLUMNS, materialize_stream
from rigatoni_spark.sources.change_events import read_change_events_stream


class MaterializedView:
    """Maintain a current-state snapshot table from a change-event feed.

    ``snapshot()`` is readable at any time between batches; the swap is
    atomic at the directory level (write new, move old out, move new
    in), so readers never observe a half-merged table.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        snapshot_dir: str,
        checkpoint_dir: str,
        pipeline: list[dict] | None = None,
    ) -> None:
        self.spark = spark
        self.source_dir = source_dir
        self.snapshot_dir = snapshot_dir
        self.checkpoint_dir = checkpoint_dir
        self.pipeline = pipeline
        self._query = None

    # -- merge one batch of per-key deltas into the snapshot --------------

    def _merge(self, delta: DataFrame, batch_id: int) -> None:
        spark = delta.sparkSession
        parts = [
            delta.select(*SNAPSHOT_COLUMNS)  # incl. delete tombstones
        ]
        if os.path.exists(self.snapshot_dir):
            parts.append(
                spark.read.parquet(self.snapshot_dir).select(*SNAPSHOT_COLUMNS)
            )
        merged = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # same winnow as operators/materialize.materialize: max version
        # wins per key; a winning tombstone removes the key
        winner = F.max_by(
            F.struct(
                F.col("operation").alias("operation"),
                F.col("full_document").alias("full_document"),
            ),
            F.col("version"),
        )
        new_snap = (
            merged.groupBy("collection", "document_key")
            .agg(winner.alias("w"), F.max("version").alias("version"))
            .filter(F.col("w.operation") != "delete")
            .select(
                "collection",
                "document_key",
                F.col("w.operation").alias("operation"),
                F.col("w.full_document").alias("full_document"),
                "version",
            )
        )
        tmp = self.snapshot_dir.rstrip("/") + f".tmp-{batch_id}"
        old = self.snapshot_dir.rstrip("/") + f".old-{batch_id}"
        new_snap.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.snapshot_dir):
            os.rename(self.snapshot_dir, old)
        os.rename(tmp, self.snapshot_dir)
        shutil.rmtree(old, ignore_errors=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self, available_now: bool = False, trigger_secs: float = 1.0):
        stream = materialize_stream(
            read_change_events_stream(
                self.spark, self.source_dir, pipeline=self.pipeline
            )
        )
        writer = stream.writeStream.queryName("materialized_view").foreachBatch(
            self._merge
        ).option("checkpointLocation", self.checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
        self._query = writer.start()
        return self

    def process_all_available(self) -> None:
        self._query.processAllAvailable()

    def await_termination(self, timeout: float | None = None) -> None:
        self._query.awaitTermination(timeout)

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    def snapshot(self) -> DataFrame:
        """The current materialized table (empty-schema DF if no batch
        has committed yet)."""
        if not os.path.exists(self.snapshot_dir):
            from rigatoni_spark.operators.materialize import _OUT_SCHEMA

            return self.spark.createDataFrame([], _OUT_SCHEMA)
        return self.spark.read.parquet(self.snapshot_dir)
