"""Change-event data model.

The reference's single flowing datatype is ``ChangeEvent``
(rigatoni-core/src/event.rs:272-311): a fixed envelope (operation,
namespace, cluster_time) plus schemaless BSON payloads. Its own Parquet
serializer resolves the fixed/dynamic split by typing the envelope
columns and keeping document payloads as JSON strings
(rigatoni-destinations/src/s3/destination.rs:286-298) — we adopt exactly
that hybrid as the Spark schema: typed envelope -> predicate pushdown +
partition pruning; JSON payload -> schema flexibility with
``get_json_object`` / ``from_json`` on demand.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Operation types (reference: rigatoni-core/src/event.rs:88-122) ----------

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_REPLACE = "replace"
OP_INVALIDATE = "invalidate"
OP_DROP = "drop"
OP_DROP_DATABASE = "dropDatabase"
OP_RENAME = "rename"

KNOWN_OPERATIONS = [
    OP_INSERT,
    OP_UPDATE,
    OP_DELETE,
    OP_REPLACE,
    OP_INVALIDATE,
    OP_DROP,
    OP_DROP_DATABASE,
    OP_RENAME,
]

# Predicate groupings (reference: event.rs:124-144)
DATA_MODIFICATION_OPS = [OP_INSERT, OP_UPDATE, OP_REPLACE]
DATA_REMOVAL_OPS = [OP_DELETE]
DDL_OPS = [OP_DROP, OP_DROP_DATABASE, OP_RENAME, OP_INVALIDATE]

# --- Envelope schema ---------------------------------------------------------
# Mirrors the reference's Parquet schema (s3/destination.rs:286-298):
# typed CDC metadata columns + JSON-string document columns.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("operation", T.StringType(), False),
        T.StructField("database", T.StringType(), False),
        T.StructField("collection", T.StringType(), False),
        T.StructField("cluster_time", T.TimestampType(), False),
        # _id (+shard key) as JSON; absent on invalidate (event.rs:286-287)
        T.StructField("document_key", T.StringType(), True),
        # full doc after op; present on insert/replace, update iff UpdateLookup
        T.StructField("full_document", T.StringType(), True),
        # update_description fields (event.rs:206-230)
        T.StructField("updated_fields", T.StringType(), True),
        T.StructField("removed_fields", T.ArrayType(T.StringType()), True),
        # TruncatedArray {field, new_size} (event.rs:222-230)
        T.StructField(
            "truncated_arrays",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("field", T.StringType(), False),
                        T.StructField("new_size", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        # checkpoint token (event.rs:306-310); monotone within a stream
        T.StructField("resume_token", T.StringType(), True),
    ]
)

# The 7-column envelope the reference's CSV/Avro serializers project
# (s3/destination.rs:220-230, :418-433).
ENVELOPE_COLUMNS = [
    "operation",
    "database",
    "collection",
    "cluster_time",
    "document_key",
    "full_document",
    "resume_token",
]
