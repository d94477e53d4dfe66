"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side contract is fully real — schema, partitioning, UDF
signatures, batch shapes — and the codec step auto-detects what this
environment can actually decode (``detect_codecs``): WAV audio parses
for real via stdlib ``wave`` everywhere, images go through PIL when it
is importable, video metadata through ffprobe when it is on PATH. For
media types with no codec present, ``decode`` raises
``CodecNotAvailable`` unless ``deterministic_fake=True``, which
substitutes a clearly-marked reproducible fake (payload-hash-derived)
so the distributed plumbing is testable end-to-end anywhere.

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


def detect_codecs() -> dict[str, bool]:
    """Which media types have a REAL decode path in this environment:
    ``image`` -> PIL if importable, ``audio`` -> stdlib ``wave`` (WAV
    headers — always present), ``video`` -> ``ffprobe`` on PATH.
    The per-type real branches below use exactly these; where a codec
    is absent the operators keep raising ``CodecNotAvailable`` with the
    deterministic fake as the opt-in fallback, so the same code runs
    real decodes on a cluster with the media stack installed and stays
    testable here."""
    import shutil

    caps = {"audio": True, "video": shutil.which("ffprobe") is not None}
    try:
        import PIL.Image  # noqa: F401

        caps["image"] = True
    except Exception:  # noqa: BLE001 — any import failure means no codec
        caps["image"] = False
    return caps


def _require_codecs(media_types, caps: dict[str, bool]) -> None:
    missing = sorted(set(media_types) - {t for t, ok in caps.items() if ok})
    if missing:
        raise CodecNotAvailable(
            f"no real codec for media types {missing} in this "
            "environment (image needs PIL, video needs ffprobe); pass "
            "deterministic_fake=True to exercise the pipeline with the "
            "reproducible fake"
        )


def _real_metadata(media_type: str, payload: bytes):
    """(width, height, duration_ms) via the real codec for this type.
    Undecodable payloads raise — corrupt media should be loud, not
    silently faked."""
    import io

    if media_type == "image":
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, None
    if media_type == "audio":
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            return (
                None,
                None,
                int(w.getnframes() * 1000 // w.getframerate()),
            )
    if media_type == "video":
        import json
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin") as f:
            f.write(payload)
            f.flush()
            out = subprocess.run(
                [
                    "ffprobe", "-v", "error", "-print_format", "json",
                    "-show_streams", "-select_streams", "v:0", f.name,
                ],
                capture_output=True,
                check=True,
            )
        st = json.loads(out.stdout)["streams"][0]
        dur = st.get("duration")
        return (
            int(st["width"]),
            int(st["height"]),
            int(float(dur) * 1000) if dur is not None else None,
        )
    raise CodecNotAvailable(f"no real metadata codec for {media_type}")


def _real_feature(
    media_type: str, payload: bytes, dim: int = FEATURE_DIM
) -> list[float]:
    """Real feature stand-ins from actual decoded content: image ->
    per-band mean intensity over ``dim`` horizontal bands; audio ->
    mean |amplitude| over ``dim`` equal time segments. Deterministic,
    content-derived, and bounded [0, 1] like the fake — a CLIP/whisper
    encoder drops into the same row contract."""
    import io

    if media_type == "image":
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            g = im.convert("L")
            w, h = g.size
            px = list(g.getdata())
            bands = []
            for b in range(dim):
                lo, hi = h * b // dim, max(h * (b + 1) // dim, h * b // dim + 1)
                vals = px[lo * w : hi * w]
                bands.append((sum(vals) / len(vals)) / 255.0 if vals else 0.0)
            return bands
    if media_type == "audio":
        import struct
        import wave

        with wave.open(io.BytesIO(payload)) as wv:
            n = wv.getnframes()
            raw = wv.readframes(n)
            k = len(raw) // 2
            samples = struct.unpack(f"<{k}h", raw[: 2 * k])
        feats = []
        for b in range(dim):
            lo, hi = k * b // dim, max(k * (b + 1) // dim, k * b // dim + 1)
            seg = samples[lo:hi]
            feats.append(
                (sum(abs(s) for s in seg) / len(seg)) / 32768.0
                if seg
                else 0.0
            )
        return feats
    raise CodecNotAvailable(f"no real feature codec for {media_type}")


def synthesize_wav_assets(spark, n: int = 16, rate: int = 8000) -> DataFrame:
    """REAL encoded media for the audio branch: ``n`` deterministic
    sine-tone WAV payloads (stdlib wave/struct — actual RIFF bytes the
    real decode path parses). Frequency and duration derive from the
    asset id, so tests can pin decoded values exactly."""
    import io
    import math
    import struct
    import wave

    rows = []
    for i in range(n):
        ms = 100 + (i % 5) * 50
        freq = 200 + (i % 20) * 50
        nf = rate * ms // 1000
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(
                    struct.pack(
                        "<h",
                        int(12000 * math.sin(2 * math.pi * freq * t / rate)),
                    )
                    for t in range(nf)
                )
            )
        payload = buf.getvalue()
        rows.append((i, "audio", bytearray(payload), i, len(payload)))
    from rigatoni_spark.tables import local_df

    return local_df(spark, rows, ASSET_SCHEMA)


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
        # feature extraction from video needs full frame decode
        # (ffmpeg), not just ffprobe metadata — never real here
        caps = (
            {**detect_codecs(), "video": False}
            if not deterministic_fake
            else {}
        )
        for pdf in batches:
            if deterministic_fake:
                feats = [_fake_feature(bytes(p)) for p in pdf["payload"]]
            else:
                _require_codecs(pdf["media_type"], caps)
                feats = [
                    _real_feature(t, bytes(p))
                    for t, p in zip(pdf["media_type"], pdf["payload"])
                ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
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
        caps = detect_codecs() if not deterministic_fake else {}
        for pdf in batches:
            if deterministic_fake:
                digests = [
                    hashlib.md5(bytes(p)).digest() for p in pdf["payload"]
                ]
                meta = [
                    (
                        16 * (1 + d[0] % 64),
                        16 * (1 + d[1] % 64),
                        1000 * (1 + d[2] % 60),
                    )
                    for d in digests
                ]
            else:
                _require_codecs(pdf["media_type"], caps)
                meta = [
                    _real_metadata(t, bytes(p))
                    for t, p in zip(pdf["media_type"], pdf["payload"])
                ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(
                        [m[0] for m in meta], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[1] for m in meta], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m[2] for m in meta], dtype="Int64"
                    ),
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
                # frame extraction needs a full ffmpeg decode, not just
                # ffprobe metadata — no real branch in any environment
                # without ffmpeg itself
                raise CodecNotAvailable(
                    "video frame sampling needs ffmpeg; pass "
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

    def _real_resize(payload: bytes):
        """PIL branch: decode, bounding-box resample, re-encode; the
        reported byte count is the REAL re-encoded size."""
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            longest = max(w, h)
            if longest > max_side:
                nw, nh = w * max_side // longest, h * max_side // longest
            else:
                nw, nh = w, h
            out = io.BytesIO()
            im.resize((max(nw, 1), max(nh, 1))).save(out, format="PNG")
            return w, h, nw, nh, out.tell()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        caps = detect_codecs() if not deterministic_fake else {}
        for pdf in batches:
            if not deterministic_fake:
                # resize is image-only (the filter below prunes other
                # types) — gate on the image codec specifically, never
                # on e.g. the always-true audio capability, so a stray
                # non-image row fails with CodecNotAvailable instead of
                # a raw PIL error
                if len(pdf):
                    _require_codecs(["image"], caps)
                rows = {k.name: [] for k in out_schema.fields}
                for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                    w, h, nw, nh, nb = _real_resize(bytes(p))
                    rows["asset_id"].append(aid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["new_width"].append(nw)
                    rows["new_height"].append(nh)
                    rows["resized_bytes"].append(nb)
                yield pd.DataFrame(rows)
                continue
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
