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

    ``snapshot()`` is readable at any time between batches. Publication
    is versioned: each batch writes a fresh ``v-<batch_id>`` directory
    under ``snapshot_dir`` and then atomically replaces the ``_CURRENT``
    pointer file (``os.replace`` — a single POSIX rename), so a reader
    always resolves a COMPLETE snapshot; there is never a moment where
    the table "does not exist" mid-swap. The previous version is kept
    until the next publication, so a DataFrame acquired just before a
    swap keeps reading its (old) files; re-acquire via ``snapshot()``
    per batch for current data. This is a two-line file-system
    approximation of what Delta/Iceberg's versioned manifest commit does
    at 100 TB; the dataflow is unchanged when the sink is swapped for a
    real table format.
    """

    _POINTER = "_CURRENT"

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

    def _current_version_dir(self) -> str | None:
        """Resolve the published snapshot directory via the pointer file
        (None before the first commit)."""
        pointer = os.path.join(self.snapshot_dir, self._POINTER)
        try:
            with open(pointer, encoding="utf-8") as fh:
                version = fh.read().strip()
        except FileNotFoundError:
            return None
        path = os.path.join(self.snapshot_dir, version)
        return path if os.path.exists(path) else None

    def _publish(self, version: str) -> None:
        """Atomically re-point ``_CURRENT`` at ``version`` and prune all
        versions except the new one and its immediate predecessor (kept
        for readers that resolved the pointer just before the swap)."""
        pointer = os.path.join(self.snapshot_dir, self._POINTER)
        prev = self._current_version_dir()
        tmp = pointer + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp, pointer)  # single atomic rename
        keep = {version, os.path.basename(prev) if prev else None}
        for name in os.listdir(self.snapshot_dir):
            if name.startswith("v-") and name not in keep:
                shutil.rmtree(
                    os.path.join(self.snapshot_dir, name), ignore_errors=True
                )

    def _merge(self, delta: DataFrame, batch_id: int) -> None:
        spark = delta.sparkSession
        parts = [
            delta.select(*SNAPSHOT_COLUMNS)  # incl. delete tombstones
        ]
        current = self._current_version_dir()
        if current is not None:
            parts.append(
                spark.read.parquet(current).select(*SNAPSHOT_COLUMNS)
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
        # overwrite handles a replayed batch_id from a crashed attempt
        version = f"v-{batch_id}"
        new_snap.write.mode("overwrite").parquet(
            os.path.join(self.snapshot_dir, version)
        )
        self._publish(version)

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
        has committed yet). Resolves the ``_CURRENT`` pointer at call
        time — re-acquire per batch; a held DataFrame keeps reading the
        version it resolved (retained for one more publication)."""
        current = self._current_version_dir()
        if current is None:
            from rigatoni_spark.operators.materialize import _OUT_SCHEMA

            return self.spark.createDataFrame([], _OUT_SCHEMA)
        return self.spark.read.parquet(current)
