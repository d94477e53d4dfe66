"""tables.concurrently — the guide-§2.6 overlap helper for independent
Spark actions — and its call sites' parity with the sequential path."""

from __future__ import annotations

import time

import pytest

from rigatoni_spark.tables import concurrently


def test_results_in_thunk_order():
    assert concurrently(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_degenerate_zero_and_one_thunk():
    assert concurrently() == []
    assert concurrently(lambda: "x") == ["x"]


def test_first_failure_reraises_after_all_complete():
    seen = []

    def ok(i):
        def _t():
            # out-wait the failing thunk so a premature re-raise would
            # be observable as a missing side effect
            time.sleep(0.05)
            seen.append(i)
            return i

        return _t

    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        concurrently(ok(0), boom, ok(2))
    # every surviving thunk ran to completion before the re-raise
    assert sorted(seen) == [0, 2]


def test_spark_actions_from_threads_match_sequential(spark):
    df = spark.range(1000)
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 3 = 0")
    c = df.selectExpr("sum(id) AS s")
    par = concurrently(a.count, b.count, lambda: c.collect()[0]["s"])
    assert par == [a.count(), b.count(), c.collect()[0]["s"]]


def test_concurrent_counts_over_shared_cold_cache(spark):
    """The _trained_tables shape: N actions racing to materialize one
    shared persisted parent must each see the full parent exactly once
    (BlockManager per-partition locks), not a partial or doubled one."""
    parent = spark.range(0, 10_000, 1, 8).persist()
    try:
        views = [
            parent.filter(f"id % {k} = 0") for k in (2, 3, 5)
        ]
        counts = concurrently(*(v.count for v in views))
        assert counts == [5000, 3334, 2000]
    finally:
        parent.unpersist()
