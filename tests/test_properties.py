"""Property-based tests (hypothesis) for the pure layers — key
generation and size/batching arithmetic hold for ALL inputs, not just
the golden fixtures (goes beyond the reference's fixed-timestamp tests,
s3_key_gen_test.rs:26-31)."""

from __future__ import annotations

import re
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from rigatoni_spark.config import (
    CompressionCodec,
    PartitionStrategy,
    SerializationFormat,
)
from rigatoni_spark.sinks.key_gen import file_extension, generate_key

_COLLECTIONS = st.from_regex(r"[a-z][a-z0-9_]{0,20}", fullmatch=True)
_TIMES = st.datetimes(
    min_value=datetime(1971, 1, 1),
    max_value=datetime(2199, 12, 31),
).map(lambda d: d.replace(tzinfo=timezone.utc))
_FORMATS = st.sampled_from(list(SerializationFormat))
_CODECS = st.sampled_from(list(CompressionCodec))
_STRATEGIES = st.sampled_from(list(PartitionStrategy))


class TestKeyGenProperties:
    @settings(max_examples=200, deadline=None)
    @given(_STRATEGIES, _COLLECTIONS, _TIMES, _FORMATS, _CODECS)
    def test_keys_are_safe_relative_paths(self, strat, coll, t, fmt, codec):
        key = generate_key(strat, coll, t, fmt, codec)
        assert not key.startswith("/")
        assert ".." not in key
        assert "//" not in key
        assert key.endswith(file_extension(fmt, codec))

    @settings(max_examples=200, deadline=None)
    @given(_COLLECTIONS, _TIMES, _FORMATS, _CODECS)
    def test_hive_layout_shape(self, coll, t, fmt, codec):
        key = generate_key(
            PartitionStrategy.HIVE_PARTITIONED, coll, t, fmt, codec
        )
        m = re.match(
            r"collection=([^/]+)/year=(\d+)/month=(\d{2})/day=(\d{2})"
            r"/hour=(\d{2})/\d+\.",
            key,
        )
        assert m and m.group(1) == coll
        assert int(m.group(2)) == t.year
        assert int(m.group(3)) == t.month
        assert int(m.group(4)) == t.day
        assert int(m.group(5)) == t.hour

    @settings(max_examples=100, deadline=None)
    @given(_STRATEGIES, _COLLECTIONS, _TIMES, _FORMATS, _CODECS)
    def test_deterministic_replay_same_key(self, strat, coll, t, fmt, codec):
        # same (group, time) -> same key: the idempotent-replay contract
        a = generate_key(strat, coll, t, fmt, codec, stem="000042-170")
        b = generate_key(strat, coll, t, fmt, codec, stem="000042-170")
        assert a == b

    @settings(max_examples=100, deadline=None)
    @given(_COLLECTIONS, _TIMES, _FORMATS, _CODECS)
    def test_strategies_partition_the_namespace(self, coll, t, fmt, codec):
        # distinct strategies never collide on the same group
        keys = {
            generate_key(s, coll, t, fmt, codec)
            for s in PartitionStrategy
        }
        assert len(keys) == len(list(PartitionStrategy))


class TestKmeansArgminKernel:
    """The Arrow argmin kernel must agree with a direct per-row Python
    evaluation of the documented rule: integer squared-L2, ties to the
    LOWER cell id. Independent of the SQL oracle (which exercises the
    same rule end-to-end through training)."""

    @given(
        vecs=st.lists(  # corpus: 1-12 vectors of dim 4, values +/-1000
            st.lists(
                st.integers(min_value=-1000, max_value=1000),
                min_size=4, max_size=4,
            ),
            min_size=1, max_size=12,
        ),
        cent_vecs=st.lists(  # centroids: 1-5 vectors, ids = list index
            st.lists(
                st.integers(min_value=-1000, max_value=1000),
                min_size=4, max_size=4,
            ),
            min_size=1, max_size=5,
        ),
    )
    @settings(max_examples=20, deadline=None)
    def test_matches_python_reference(self, vecs, cent_vecs, spark):
        import pyspark.sql.functions as F

        from rigatoni_spark.llm.vectors import _kmeans_argmin_struct

        cents = list(enumerate(cent_vecs))
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id bigint, q array<bigint>",
        )
        got = {
            r["vec_id"]: (r["s"]["cell"], r["s"]["dist"])
            for r in df.select(
                "vec_id", _kmeans_argmin_struct(F.col("q"), cents).alias("s")
            ).collect()
        }
        for i, v in enumerate(vecs):
            dists = [
                (sum((a - b) ** 2 for a, b in zip(v, c)), cid)
                for cid, c in cents
            ]
            want_dist, want_cell = min(dists)
            assert got[i] == (want_cell, want_dist), (i, got[i], dists)
