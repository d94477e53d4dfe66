"""Filter / predicate / projection operators.

F1: the reference pushes an arbitrary Mongo aggregation pipeline
(canonically ``$match``) into the change stream server-side
(stream.rs:474-475, applied at stream.rs:909-917). Here the same
pipeline dict is *translated to Catalyst Column predicates* —
``df.filter(translated)`` — and Catalyst pushes envelope-column
predicates all the way to the parquet scan (PushedFilters), which is
the Spark-native equivalent of server-side $match.

Scope mirrors what the reference actually demonstrates
(stream.rs:122-129, rigatoni-examples/change_stream_listener.rs:153-165):
``$match`` with equality / ``$in`` / comparison operators on
``operationType`` and ``fullDocument.*`` fields, plus ``$and``/``$or``/
``$nin``/``$ne``/``$exists``. Anything else raises (SURVEY.md §7.3).

F2: client-side filter by operation type (event.rs:124-144, 313-347).
F3: invalidate detection (stream.rs:1211-1220).
F4: envelope projection (s3/destination.rs:220-230).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rigatoni_spark.schema import (
    DATA_MODIFICATION_OPS,
    ENVELOPE_COLUMNS,
    OP_INVALIDATE,
)

# Mongo field path -> engine column
_FIELD_MAP = {
    "operationType": "operation",
    "ns.db": "database",
    "ns.coll": "collection",
    "clusterTime": "cluster_time",
}

_JSON_ROOTS = {
    "fullDocument": "full_document",
    "documentKey": "document_key",
    "updateDescription.updatedFields": "updated_fields",
}


class UnsupportedMatchExpression(ValueError):
    """Raised for $match constructs outside the reference's demonstrated
    scope (SURVEY.md §7.3: fail loudly rather than silently mis-filter)."""


def _field_column(path: str) -> Column:
    """Resolve a Mongo field path to a Column.

    Envelope fields map to typed columns (pushdown-eligible); document
    fields map to ``get_json_object`` over the JSON payload columns —
    the same hybrid the reference's Parquet schema encodes
    (s3/destination.rs:266-275).
    """
    if path in _FIELD_MAP:
        return F.col(_FIELD_MAP[path])
    for root, col_name in _JSON_ROOTS.items():
        if path == root:
            return F.col(col_name)
        if path.startswith(root + "."):
            sub = path[len(root) + 1 :]
            return F.get_json_object(F.col(col_name), f"$.{sub}")
    raise UnsupportedMatchExpression(f"unsupported field path: {path!r}")


def _coerce(col: Column, value: Any) -> Column:
    """JSON-extracted values are strings; cast for numeric comparison."""
    if isinstance(value, bool):
        return col.cast("boolean")
    if isinstance(value, int):
        return col.cast("bigint")
    if isinstance(value, float):
        return col.cast("double")
    return col


def _condition(path: str, spec: Any) -> Column:
    col = _field_column(path)
    if isinstance(spec, dict):
        conds: list[Column] = []
        for op, val in spec.items():
            if op == "$in":
                # coerce from the first element so numeric membership on
                # JSON-extracted strings agrees with $eq on the same value
                conds.append(_coerce(col, val[0]).isin(*val) if val else F.lit(False))
            elif op == "$nin":
                # Mongo's $nin matches docs where the field is missing;
                # NOT isin() null-propagates and would drop them
                coerced = _coerce(col, val[0]) if val else col
                conds.append(
                    col.isNull() | ~coerced.isin(*val) if val else F.lit(True)
                )
            elif op == "$eq":
                conds.append(_coerce(col, val) == val)
            elif op == "$ne":
                conds.append(_coerce(col, val) != val)
            elif op == "$gt":
                conds.append(_coerce(col, val) > val)
            elif op == "$gte":
                conds.append(_coerce(col, val) >= val)
            elif op == "$lt":
                conds.append(_coerce(col, val) < val)
            elif op == "$lte":
                conds.append(_coerce(col, val) <= val)
            elif op == "$exists":
                conds.append(col.isNotNull() if val else col.isNull())
            else:
                raise UnsupportedMatchExpression(f"unsupported operator: {op!r}")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    # bare value = equality
    return _coerce(col, spec) == spec


def match_to_column(match: dict[str, Any]) -> Column:
    """Translate a ``$match`` document body into one Column predicate."""
    conds: list[Column] = []
    for key, spec in match.items():
        if key == "$and":
            sub = [match_to_column(m) for m in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
        elif key == "$or":
            sub = [match_to_column(m) for m in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(c)
        else:
            conds.append(_condition(key, spec))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def match_pipeline(df: DataFrame, pipeline: list[dict[str, Any]]) -> DataFrame:
    """Apply a Mongo-style aggregation pipeline (``$match`` stages only)
    as Catalyst filters (F1). Multiple stages AND together, exactly like
    chained ``$match`` stages server-side."""
    for stage in pipeline:
        if set(stage.keys()) != {"$match"}:
            raise UnsupportedMatchExpression(
                f"only $match stages are supported, got {sorted(stage.keys())}"
            )
        df = df.filter(match_to_column(stage["$match"]))
    return df


def filter_ops(df: DataFrame, *operations: str) -> DataFrame:
    """F2: keep only the given operation types
    (event.rs:313-347; bench batch_processing.rs:149-177)."""
    return df.filter(F.col("operation").isin(*operations))


def filter_data_modifications(df: DataFrame) -> DataFrame:
    """is_data_modification (event.rs:124-133): insert/update/replace."""
    return df.filter(F.col("operation").isin(*DATA_MODIFICATION_OPS))


def filter_invalidates(df: DataFrame) -> DataFrame:
    """F3: invalidate events are terminal stream errors in the reference
    (stream.rs:1211-1220); route them to an alerting sink / stop the
    query. This selects them for that side channel."""
    return df.filter(F.col("operation") == OP_INVALIDATE)


def project_envelope(df: DataFrame) -> DataFrame:
    """F4: the 7-column envelope every serializer writes
    (s3/destination.rs:220-230, :286-298, :418-433)."""
    return df.select(*ENVELOPE_COLUMNS)


def filter_ddl(df: DataFrame) -> DataFrame:
    """is_ddl (event.rs:135-144): drop/dropDatabase/rename/invalidate —
    schema-change events routed to operational handling, not data flow."""
    from rigatoni_spark.schema import DDL_OPS

    return df.filter(F.col("operation").isin(*DDL_OPS))
