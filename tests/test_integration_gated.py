"""Self-skipping integration tests for the two sandbox-gated real
paths (round-9 ask #7): a live Kafka broker and the spark-avro jar.

In this container both skip with an actionable reason. On a host where
the dependency appears they run the REAL branch automatically — no
test-code change needed:

- Kafka: set ``RIGATONI_KAFKA_BOOTSTRAP=host:port`` (and launch Spark
  with ``org.apache.spark:spark-sql-kafka-0-10_2.13`` on the
  classpath). The test produces Debezium envelopes to a unique topic
  through Spark's own Kafka sink and drains them back through
  ``read_kafka_change_events`` into a memory sink.
- spark-avro: launch with ``org.apache.spark:spark-avro_2.13`` on the
  classpath (auto-detected). The test drives ``write_batch`` AVRO+GZIP,
  asserts the JAR tier (not the pure-Python fallback) produced the
  object, and decodes the bytes with the independent pure-Python
  reader (sinks/avro_codec.py) to prove the two tiers stay
  wire-compatible.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import uuid

import pytest

KAFKA = os.environ.get("RIGATONI_KAFKA_BOOTSTRAP")


def _avro_jar_present(spark, tmp_path) -> bool:
    """Probe with a real 1-row write: classpath introspection
    false-positives (Spark ships a stub org.apache.spark.sql.avro
    class for its own error messages even without the module)."""
    try:
        spark.range(1).write.format("avro").mode("overwrite").save(
            str(tmp_path / "_avro_probe")
        )
        return True
    except Exception:  # noqa: BLE001 — lookup failure means absent
        return False


def _debezium_envelope(op: str, uid: int, ts_ms: int) -> str:
    return json.dumps(
        {
            "op": op,
            "source": {"db": "appdb", "collection": f"c{uid % 2}", "ts_ms": ts_ms},
            "documentKey": json.dumps({"_id": uid}),
            "after": json.dumps({"_id": uid, "k": uid * 10}),
            "updateDescription": None,
        }
    )


@pytest.mark.skipif(
    not KAFKA,
    reason="no Kafka broker: set RIGATONI_KAFKA_BOOTSTRAP=host:port and "
    "add org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages",
)
def test_kafka_debezium_source_end_to_end(spark, tmp_path):
    """Produce Debezium envelopes to a unique topic, drain them back
    through the real Kafka streaming source, and check the parsed
    ChangeEvent rows — the live-broker half of S2 the sandbox cannot
    run (the wire format itself is already oracle-gated broker-less
    via s2_debezium_roundtrip)."""
    from rigatoni_spark.sources.kafka import read_kafka_change_events

    topic = f"rigatoni_it_{uuid.uuid4().hex[:8]}"
    envelopes = [
        _debezium_envelope("c", 1, 1_700_000_000_000),
        _debezium_envelope("u", 2, 1_700_000_001_000),
        _debezium_envelope("d", 1, 1_700_000_002_000),
    ]
    (
        spark.createDataFrame([(e,) for e in envelopes], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )
    stream = read_kafka_change_events(spark, KAFKA, topic)
    qname = f"kafka_it_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "kafka drain did not finish in 120s"
    rows = sorted(
        spark.sql(f"SELECT * FROM {qname}").collect(),
        key=lambda r: r["resume_token"],
    )
    assert [r["operation"] for r in rows] == ["insert", "update", "delete"]
    assert all(r["database"] == "appdb" for r in rows)
    assert rows[0]["collection"] == "c1" and rows[1]["collection"] == "c0"
    assert json.loads(rows[0]["full_document"])["k"] == 10


def test_spark_avro_jar_tier_end_to_end(spark, change_events, tmp_path, monkeypatch):
    """K6's preferred tier: with the spark-avro jar on the classpath,
    write_batch must serialize through the JAR (executor-parallel JVM
    Avro), not the pure-Python fallback — and the produced .avro.gz
    bytes must decode with the independent pure-Python reader, pinning
    cross-tier wire compatibility."""
    from rigatoni_spark.config import (
        CompressionCodec,
        S3SinkConfig,
        SerializationFormat,
    )
    from rigatoni_spark.sinks import writers
    from rigatoni_spark.sinks.avro_codec import read_avro_bytes

    if not _avro_jar_present(spark, tmp_path):
        pytest.skip(
            "spark-avro jar not on classpath: add "
            "org.apache.spark:spark-avro_2.13:<spark version> to "
            "spark.jars.packages"
        )

    tiers: list[str | None] = []
    orig = writers._staged_writer

    def spy(*a, **k):
        mode = orig(*a, **k)
        tiers.append(mode)
        return mode

    monkeypatch.setattr(writers, "_staged_writer", spy)
    cfg = S3SinkConfig(
        bucket=str(tmp_path / "out"),
        format=SerializationFormat.AVRO,
        compression=CompressionCodec.GZIP,
    )
    keys = writers.write_batch(change_events.limit(50), cfg, batch_id=0)
    assert keys and all(k.endswith(".avro.gz") for k in keys)
    assert tiers == ["avro_jar"], f"expected the jar tier, got {tiers}"
    files = glob.glob(str(tmp_path / "out" / "**" / "*.avro.gz"), recursive=True)
    assert sorted(os.path.relpath(f, str(tmp_path / "out")) for f in files) == sorted(keys)
    total = 0
    for f in files:
        with open(f, "rb") as fh:
            _, records = read_avro_bytes(gzip.decompress(fh.read()))
        total += len(records)
        for rec in records:
            assert "operation" in rec and "collection" in rec
    assert total == change_events.limit(50).count()
