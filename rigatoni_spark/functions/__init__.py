"""Reusable column-expression builders (the engine's scalar-function
layer — JVM-side, codegen-friendly; no Python UDFs).

The reference has no scalar function library (SURVEY.md §2.8); these
are the shared primitives the operators above are composed from, kept
importable for users building their own pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_field(col: Column | str, path: str) -> Column:
    """Extract a field from a JSON payload column (the dynamic half of
    the change-event schema): ``json_field("full_document", "k")``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def hex_to_bigint(hex_col: Column, digits: int = 8) -> Column:
    """First ``digits`` hex chars -> bigint (<= 15 digits stays within
    int64). Cross-engine twin: DuckDB ``('0x' || substr(h,1,n))::BIGINT``."""
    if digits > 15:
        raise ValueError("more than 15 hex digits overflows a signed int64")
    return F.conv(F.substring(hex_col, 1, digits), 16, 10).cast("bigint")


def salted_hash(salt: int | str, col: Column) -> Column:
    """Deterministic 'independent hash function' family: md5 of a
    salt-prefixed value (used by MinHash/LSH instead of RNG seeds)."""
    return F.md5(F.concat(F.lit(f"{salt}:"), col))


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise-double dot product as a left-to-right fold —
    deterministic summation order, identical cross-engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def namespace_full_name() -> Column:
    """'db.collection' (Namespace::full_name, event.rs:196-200)."""
    return F.concat_ws(".", F.col("database"), F.col("collection"))


def exact_sum(col: Column | str, scale: int = 4) -> Column:
    """Partitioning-independent sum of a double column: cast to
    DECIMAL(18,scale) pre-sum (exact), cast back to double after."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
