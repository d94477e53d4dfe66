"""Avro container codec (K6 fallback tier): spec round-trips.

The writer/reader pair implements the public Avro 1.11.x container
spec for flat nullable-primitive records; these tests pin the wire
behavior the sink relies on (nulls, unicode, multi-block files,
deflate, determinism for replay-idempotent objects)."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pytest

from rigatoni_spark.sinks.avro_codec import read_avro, write_avro


@pytest.fixture()
def table():
    return pa.table(
        {
            "s": pa.array(["a", None, 'q"uote', "日本語"]),
            "n": pa.array([1, -2, None, 2**40], pa.int64()),
            "d": pa.array([1.5, None, -0.0, 3.14159]),
            "b": pa.array([True, False, None, True]),
            "ts": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),
                    None,
                    datetime.datetime(1970, 1, 1),
                    datetime.datetime(2030, 12, 31, 23, 59, 59),
                ],
                pa.timestamp("us"),
            ),
        }
    )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_round_trip(table, tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_avro(table, p, codec=codec)
    schema, rows = read_avro(p)
    assert [f["name"] for f in schema["fields"]] == list(table.schema.names)
    assert [r["s"] for r in rows] == ["a", None, 'q"uote', "日本語"]
    assert [r["n"] for r in rows] == [1, -2, None, 2**40]
    assert rows[1]["d"] is None and rows[3]["d"] == 3.14159
    assert [r["b"] for r in rows] == [True, False, None, True]
    # timestamp-micros logical: micros since epoch
    assert rows[0]["ts"] == 1704067798778549 and rows[2]["ts"] == 0
    assert schema["fields"][4]["type"][1]["logicalType"] == "timestamp-micros"


def test_multi_block(tmp_path):
    big = pa.table({"x": pa.array(list(range(10000)), pa.int64())})
    p = str(tmp_path / "big.avro")
    write_avro(big, p, codec="deflate", block_rows=1000)
    _, rows = read_avro(p)
    assert [r["x"] for r in rows] == list(range(10000))


def test_deterministic_bytes(table, tmp_path):
    """Replayed batches must produce byte-identical objects (the sink's
    replay-idempotence contract extends to content, not just keys)."""
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro(table, p1)
    write_avro(table, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_nanos_timestamps_normalized(tmp_path):
    t = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)], pa.timestamp("ns")
            )
        }
    )
    p = str(tmp_path / "ns.avro")
    write_avro(t, p)
    _, rows = read_avro(p)
    assert rows[0]["ts"] == 1704067200000000  # micros, not nanos


def test_unsupported_type_raises(tmp_path):
    t = pa.table({"arr": pa.array([[1, 2]], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="unsupported arrow type"):
        write_avro(t, str(tmp_path / "x.avro"))
    assert not os.path.exists(str(tmp_path / "x.avro"))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    _rows = st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=80)),
            st.one_of(
                st.none(),
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
            ),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),
            ),
            st.one_of(st.none(), st.booleans()),
            st.one_of(st.none(), st.binary(max_size=40)),
        ),
        min_size=0,
        max_size=50,
    )

    @given(rows=_rows, codec=st.sampled_from(["null", "deflate"]))
    @settings(max_examples=60, deadline=None)
    def test_property_round_trip(rows, codec, tmp_path_factory):
        """Any mix of nullable string/long/double/boolean/bytes survives
        the container round-trip bit-exactly, under either codec —
        including zigzag edge values (+/- 2^63), empty batches, empty
        strings/bytes, and unicode."""
        cols = list(zip(*rows)) if rows else ([], [], [], [], [])
        t = pa.table(
            {
                "s": pa.array(cols[0], pa.string()),
                "n": pa.array(cols[1], pa.int64()),
                "d": pa.array(cols[2], pa.float64()),
                "b": pa.array(cols[3], pa.bool_()),
                "y": pa.array(cols[4], pa.binary()),
            }
        )
        p = str(tmp_path_factory.mktemp("prop") / "t.avro")
        write_avro(t, p, codec=codec, block_rows=7)
        _, got = read_avro(p)
        assert [
            (r["s"], r["n"], r["d"], r["b"], r["y"]) for r in got
        ] == rows
