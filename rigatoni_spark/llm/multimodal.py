"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side contract is fully real — schema, partitioning, UDF
signatures, batch shapes — while the codec step is stubbed: the
image/audio libraries are not in this container, so ``decode``
raises ``CodecNotAvailable`` unless ``deterministic_fake=True``, which
substitutes a clearly-marked reproducible fake (payload-hash-derived)
so the distributed plumbing is testable end-to-end.

Scale notes:
- payloads stay in executors; nothing is collected. ``mapInPandas``
  streams Arrow batches, so peak memory is one batch of binaries per
  task — size with spark.sql.execution.arrow.maxRecordsPerBatch when
  payloads are large (a few thousand 1 MB images per batch otherwise).
- metadata is a separate narrow column set so pruning works: scans that
  only need (asset_id, media_type, width, height) never touch bytes —
  at 100 TB this is the difference between a metadata query in seconds
  and a full-corpus read.
- feature vectors come back as ``array<float>`` ready for
  vectors.cosine_topk / ann_lsh_topk.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("source_doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 8


class CodecNotAvailable(NotImplementedError):
    """Raised where a real image/audio codec would run; this container
    ships no media libraries (environment constraint — the Spark
    plumbing around it is real and tested)."""


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Deterministic binary assets derived from the documents table —
    stands in for an ingested media corpus (payload = utf-8 text bytes;
    media_type round-robins by doc_id)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        F.col("doc_id").alias("source_doc_id"),
        F.length(F.col("text")).cast("bigint").alias("n_bytes"),
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """DETERMINISTIC FAKE: 8-dim feature from the payload digest.
    Replace with a real encoder (CLIP/whisper/etc.) on a cluster with
    the model runtime installed."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(
    assets: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """payload -> feature vector via Arrow-batched mapInPandas."""

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise CodecNotAvailable(
                    "no media codec in this environment; pass "
                    "deterministic_fake=True to exercise the pipeline"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _fake_feature(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(run, schema=out_schema)


def decode_metadata(
    assets: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Decode step (image dims / audio duration / video frames).

    Real implementation would open the payload with PIL/libav; here the
    fake derives plausible metadata from the digest so downstream
    schema/partitioning is exercised.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise CodecNotAvailable(
                    "no media codec in this environment; pass "
                    "deterministic_fake=True to exercise the pipeline"
                )
            digests = [hashlib.md5(bytes(p)).digest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": [16 * (1 + d[0] % 64) for d in digests],
                    "height": [16 * (1 + d[1] % 64) for d in digests],
                    "duration_ms": [int(1000 * (1 + d[2] % 60)) for d in digests],
                }
            )

    return assets.mapInPandas(run, schema=out_schema)


def frame_sample(
    assets: DataFrame, every_ms: int = 1000, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame —
    demonstrates the 1->N mapInPandas expansion shape."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise CodecNotAvailable(
                    "no media codec in this environment; pass "
                    "deterministic_fake=True to exercise the pipeline"
                )
            rows = {"asset_id": [], "frame_idx": [], "frame_payload": []}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = 1 + hashlib.md5(bytes(p)).digest()[3] % 4
                for i in range(n_frames):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(
                        hashlib.md5(bytes(p) + bytes([i])).digest()
                    )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=out_schema
    )


def resize_images(
    assets: DataFrame, max_side: int = 256, deterministic_fake: bool = False
) -> DataFrame:
    """Image resize to a bounding box (aspect-ratio preserving) — the
    standard normalization step before feature extraction. Real codec
    would decode, resample, and re-encode; the fake reproduces the
    SIZE arithmetic exactly (source dims from the decode fake, target
    dims by integer floor-scale, resized byte count proportional to
    pixel count) so the distributed shape and the downstream schema are
    exercised and oracle-checkable end to end.

    Only images flow in (filter BEFORE the Python stage — Catalyst
    prunes the other media types at the scan, so the Arrow channel
    never carries audio/video bytes)."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("new_width", T.IntegerType()),
            T.StructField("new_height", T.IntegerType()),
            T.StructField("resized_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise CodecNotAvailable(
                    "no media codec in this environment; pass "
                    "deterministic_fake=True to exercise the pipeline"
                )
            rows = {k.name: [] for k in out_schema.fields}
            for aid, p, nb in zip(
                pdf["asset_id"], pdf["payload"], pdf["n_bytes"]
            ):
                d = hashlib.md5(bytes(p)).digest()
                w = 16 * (1 + d[0] % 64)
                h = 16 * (1 + d[1] % 64)
                longest = max(w, h)
                if longest > max_side:
                    nw = w * max_side // longest
                    nh = h * max_side // longest
                else:
                    nw, nh = w, h
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["resized_bytes"].append(int(nb) * (nw * nh) // (w * h))
            yield pd.DataFrame(rows)

    return assets.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=out_schema
    )
