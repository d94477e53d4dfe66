"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime by splitting oversized partitions. This operator is the static
fallback for pathological keys (one key = 30% of a 100 TB fact table):
the fact side gets a deterministic salt in [0, n); the dimension side is
replicated n times; the join runs on (key, salt), spreading each hot key
over n tasks. Replication multiplies the small side by n — use for
fact ⋈ dim-that-missed-the-broadcast-threshold, not fact ⋈ fact.

The salt is ``pmod(hash(entire fact row), n)`` — deterministic (same
input → same salt → reproducible plans), uniform, and independent of
the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted; result identical to
    ``fact.join(dim, on, how)`` (asserted in tests)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim is replicated)")
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("_salt", salt)
    d = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    return f.join(d, [*on, "_salt"], how).drop("_salt")
