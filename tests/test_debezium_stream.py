"""Broker-less Debezium CDC end-to-end: envelope JSONL feed -> the
real streaming engine -> downstream operators -> keyed sink objects.

The reference's whole identity is a live change stream
(rigatoni-core/src/stream.rs:891-944); no broker exists in this
container, so the same per-record shape Kafka would deliver (one
Debezium JSON value per message) is fed as appended JSONL files
through `read_debezium_file_stream` — the parse and everything
downstream are IDENTICAL to the Kafka path."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rigatoni_spark.sources.kafka import read_debezium_file_stream


def _debezium_lines(n: int, start: int = 0) -> list[str]:
    """Deterministic Debezium MongoDB envelopes: inserts, updates (with
    removedFields), deletes across two collections."""
    ops = ["c", "u", "d", "c", "u"]
    out = []
    for i in range(start, start + n):
        op = ops[i % len(ops)]
        ev = {
            "op": op,
            "source": {
                "db": "shop",
                "collection": "orders" if i % 2 == 0 else "users",
                "ts_ms": 1706000000000 + i * 1000,
            },
            "documentKey": {"_id": i % 7},
            "after": None
            if op == "d"
            else {"_id": i % 7, "total": i * 1.5},
            "updateDescription": {
                "updatedFields": {"total": i * 1.5},
                "removedFields": ["note"] if i % 4 == 1 else [],
            }
            if op == "u"
            else None,
        }
        out.append(json.dumps(ev))
    return out


def test_debezium_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "feed"
    src.mkdir()
    (src / "batch0.jsonl").write_text("\n".join(_debezium_lines(40)) + "\n")

    got: list = []
    ce = read_debezium_file_stream(spark, str(src))
    # a real downstream operator on the live stream: data-modification
    # filter (F2) before the sink
    filtered = ce.filter(F.col("operation").isin("insert", "update"))
    q = (
        filtered.writeStream.foreachBatch(
            lambda df, _id: got.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    n_first = len(got)
    assert n_first == 32  # 40 minus 8 deletes

    # second feed file = new Kafka records arriving; resume from ckpt
    (src / "batch1.jsonl").write_text(
        "\n".join(_debezium_lines(10, start=40)) + "\n"
    )
    q2 = (
        read_debezium_file_stream(spark, str(src))
        .filter(F.col("operation").isin("insert", "update"))
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)
    assert len(got) == 32 + 8

    # envelope fidelity: ops mapped, event-time real, update desc typed
    by_token = {r["resume_token"]: r for r in got}
    r1 = by_token["1706000001000"]  # i=1: op=u
    assert r1["operation"] == "update"
    assert r1["database"] == "shop" and r1["collection"] == "users"
    assert r1["removed_fields"] == ["note"]
    assert r1["cluster_time"].year == 2024
    assert json.loads(r1["updated_fields"]) == {"total": 1.5}
    assert all(r["operation"] != "delete" for r in got)


def test_debezium_stream_into_keyed_sink(spark, tmp_path):
    """Full reference topology: CDC stream -> envelope -> keyed objects
    on the destination (collection-based layout, JSONL)."""
    from rigatoni_spark.config import (
        PartitionStrategy,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.sinks.writers import write_batch

    src = tmp_path / "feed"
    src.mkdir()
    (src / "b0.jsonl").write_text("\n".join(_debezium_lines(30)) + "\n")
    out = tmp_path / "sink"
    cfg = S3SinkConfig(
        bucket=str(out),
        format=SerializationFormat.JSON,
        partition_strategy=PartitionStrategy.COLLECTION_BASED,
    )

    keys: list[str] = []
    ce = read_debezium_file_stream(spark, str(src))
    q = (
        ce.writeStream.foreachBatch(
            lambda df, bid: keys.extend(write_batch(df, cfg, batch_id=bid))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert keys and all(k.endswith(".jsonl") for k in keys)
    colls = {k.split("/")[0] for k in keys}
    assert colls == {"orders", "users"}
    # objects really exist and carry the envelope
    first = os.path.join(str(out), keys[0])
    rows = [json.loads(line) for line in open(first)]
    assert rows and {"operation", "collection", "resume_token"} <= set(rows[0])


def test_kafka_source_gate_is_actionable(spark):
    """Without the kafka-sql jar (this container), the Kafka reader must
    raise the actionable SourceNotAvailable naming the jar coordinate —
    never a raw ClassNotFound stack."""
    from rigatoni_spark.sources.kafka import (
        SourceNotAvailable,
        read_kafka_change_events,
    )

    try:
        df = read_kafka_change_events(spark, "localhost:9092", "events")
    except SourceNotAvailable as e:
        assert "spark-sql-kafka" in str(e)
    else:
        # jar present in some environments: the reader builds a valid
        # streaming plan without contacting a broker
        assert df.isStreaming
