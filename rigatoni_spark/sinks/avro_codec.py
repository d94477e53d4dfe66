"""Minimal pure-Python Avro Object Container File codec (K6 fallback).

The reference ships a working Avro serializer behind a cargo feature
(rigatoni-destinations/src/s3/destination.rs:401-471, lib.rs:28-37).
The Spark-native equivalent is the external spark-avro module; when its
jar is absent from the classpath this codec makes the AVRO format
executable anyway: a from-the-spec implementation of the Avro 1.11.x
container file format (https://avro.apache.org/docs/1.11.1/specification/
— public spec) covering exactly the envelope's shape: flat records of
nullable primitives (string/long/double/boolean/bytes and
timestamp-micros logicals).

Scope is deliberately narrow — this is the sink serializer fallback,
not a general Avro library:

* writer: null and deflate codecs, one-block-per-call container files;
* reader: enough to round-trip what the writer (or any compliant
  writer of the same shapes) produced — used by the tests and by
  downstream consumers of small sink objects.

Scale note: the jar path serializes executor-side in the JVM and is
the 100 TB route; this fallback converts staged part-files as
distributed executor tasks (one per part-file, writers.py rename
pass; in-process when a batch staged a single file), bounded by
micro-batch size — the same per-batch CPU-side serialization the
reference performs in Rust, but fanned out over the cluster.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pyarrow as pa

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic sync marker (spec: any 16 bytes)


def is_jar_absent_error(e: BaseException) -> bool:
    """True when an Avro read/write failed because the spark-avro jar
    is not on the classpath — the ONLY condition that may route to this
    fallback codec. Any other error (corrupt object, schema mismatch —
    messages that also contain 'avro') must surface to the caller.
    Shared by the writer and reader tiers so a Spark-version message
    change is patched in one place."""
    msg = str(e)
    return (
        "Failed to find data source" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
        or "ClassNotFoundException" in msg
    )

# ---------------------------------------------------------------- encoding


def _write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag varint (spec: long / int encoding)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _write_str(buf: io.BytesIO, s: str) -> None:
    _write_bytes(buf, s.encode("utf-8"))


def _arrow_to_avro_type(t: pa.DataType) -> object:
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    raise ValueError(f"unsupported arrow type for avro fallback: {t}")


def schema_for_table(table: pa.Table, name: str = "ChangeEvent") -> dict:
    """Avro record schema for a flat arrow table, every field nullable
    (union ["null", T]) — matching spark-avro's nullable mapping."""
    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", _arrow_to_avro_type(f.type)],
            }
            for f in table.schema
        ],
    }


def _encode_value(buf: io.BytesIO, v: pa.Scalar, avro_type: object) -> None:
    logical = isinstance(avro_type, dict)
    base = avro_type["type"] if logical else avro_type
    if base == "long":
        if logical and avro_type.get("logicalType") == "timestamp-micros":
            # arrow timestamp scalar in micros unit -> micros since epoch
            _write_long(buf, v.value)
        else:
            _write_long(buf, v.as_py())
    elif base == "double":
        buf.write(struct.pack("<d", v.as_py()))
    elif base == "boolean":
        buf.write(b"\x01" if v.as_py() else b"\x00")
    elif base == "bytes":
        _write_bytes(buf, v.as_py())
    elif base == "string":
        _write_str(buf, v.as_py())
    else:
        raise ValueError(f"unsupported avro type {avro_type}")


def write_avro(
    table: pa.Table, path: str, codec: str = "null", block_rows: int = 4096
) -> None:
    """Serialize a flat arrow table to an Avro container file."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    # normalize timestamps to micros so scalar .value IS timestamp-micros
    table = pa.table(
        {
            f.name: table.column(f.name).cast(pa.timestamp("us"))
            if pa.types.is_timestamp(f.type)
            else table.column(f.name)
            for f in table.schema
        }
    )
    schema = schema_for_table(table)
    field_types = [f["type"][1] for f in schema["fields"]]
    cols = [table.column(i) for i in range(table.num_columns)]

    out = io.BytesIO()
    out.write(_MAGIC)
    # file metadata: a map with one block of 2 entries, then end-of-map
    _write_long(out, 2)
    _write_str(out, "avro.schema")
    _write_bytes(out, json.dumps(schema).encode("utf-8"))
    _write_str(out, "avro.codec")
    _write_bytes(out, codec.encode("utf-8"))
    _write_long(out, 0)
    out.write(_SYNC)

    n = table.num_rows
    for start in range(0, n, block_rows):
        stop = min(start + block_rows, n)
        block = io.BytesIO()
        for i in range(start, stop):
            for col, ftype in zip(cols, field_types):
                v = col[i]
                if not v.is_valid:
                    _write_long(block, 0)  # union branch: null
                else:
                    _write_long(block, 1)  # union branch: the value
                    _encode_value(block, v, ftype)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate (spec)
        _write_long(out, stop - start)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(_SYNC)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


# ---------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_str(self) -> str:
        return self.read_bytes().decode("utf-8")


def _decode_value(r: _Reader, avro_type: object) -> object:
    logical = isinstance(avro_type, dict)
    base = avro_type["type"] if logical else avro_type
    if base == "long":
        return r.read_long()
    if base == "double":
        return struct.unpack("<d", r.read(8))[0]
    if base == "boolean":
        return r.read(1) == b"\x01"
    if base == "bytes":
        return r.read_bytes()
    if base == "string":
        return r.read_str()
    raise ValueError(f"unsupported avro type {avro_type}")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Parse an Avro container file of flat nullable-primitive records.

    Returns (schema, rows). Raises on shapes outside the writer's scope.
    """
    with open(path, "rb") as f:
        return read_avro_bytes(f.read())


def read_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """:func:`read_avro` over in-memory bytes (e.g. a gunzipped object)."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError("not an avro container file")
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:  # spec: negative count is followed by a byte size
            count = -count
            r.read_long()
        for _ in range(count):
            k = r.read_str()  # MUST read key before value (RHS-first!)
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)

    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    rows: list[dict] = []
    while r.pos < len(r.data):
        n_rows = r.read_long()
        payload = r.read_bytes()
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        br = _Reader(payload)
        for _ in range(n_rows):
            row = {}
            for name, ftype in fields:
                branch = br.read_long()
                if isinstance(ftype, list):
                    chosen = ftype[branch]
                    row[name] = (
                        None
                        if chosen == "null"
                        else _decode_value(br, chosen)
                    )
                else:
                    raise ValueError("non-union field outside writer scope")
            rows.append(row)
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, rows
