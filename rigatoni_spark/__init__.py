"""rigatoni_spark — a PySpark-native CDC / data-pipeline engine.

A from-scratch re-expression of the capabilities of the
``valeriouberti/rigatoni`` CDC framework (Rust; studied read-only at
/root/reference) on Apache Spark:

- change-event data model  -> fixed StructType envelope + JSON payload columns
  (reference: rigatoni-core/src/event.rs:272-311)
- change-stream sources    -> Structured Streaming / batch DataFrames
  (reference: rigatoni-core/src/stream.rs, pipeline.rs workers)
- $match pushdown filter   -> Catalyst Column predicates (pushed to parquet)
  (reference: rigatoni-core/src/stream.rs:474-475,909-917)
- batching                 -> micro-batch triggers + event-time windows
  (reference: rigatoni-core/src/pipeline.rs:1171-1279)
- dedup by document key    -> dropDuplicates / window row_number
  (reference: rigatoni-benches/benches/batch_processing.rs:320-354)
- S3 destination           -> DataFrameWriter with format/compression/
  partition-key strategies (reference: rigatoni-destinations/src/s3/*)
- at-least-once + resume   -> checkpointLocation / foreachBatch
  (reference: rigatoni-core/src/stream.rs:359-458)

Everything is DataFrame-first: each operator is a function
``DataFrame -> DataFrame`` usable under both ``spark.read`` and
``spark.readStream``; Catalyst owns the physical plan. Beyond the
reference surface, ``rigatoni_spark.llm`` adds the large-scale
training-data operators (dedup families, similarity search, text
analysis, multimodal columns) designed for 100 TB-scale partitioning.
"""

__version__ = "0.1.0"

from rigatoni_spark.session import get_spark  # noqa: F401
