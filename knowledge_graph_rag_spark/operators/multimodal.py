"""Multimodal span handling: media as opaque binary + typed metadata.

The interleaved documents carry media spans (kind ∈ {image, audio, table},
media_ref URI). Codec *libraries* are not in this container, but the decode
step is real wherever the standard library + numpy suffice
(functions/mediacodecs.py): PNG (full 8-bit pixel decode incl. scanline
unfiltering), BMP, PPM, PCM WAV, and baseline JPEG (Huffman + dequant +
IDCT, 4:4:4/4:2:2/4:2:0) are sniffed and decoded with status ``ok``; only
MP3/MP4-class codecs (and exotic JPEG: progressive/arithmetic) remain
stubbed behind a deterministic fake (status ``ok_stub``), with the
Spark-side plumbing (schema,
partitioning, Arrow batch shape, mapInPandas signature) identical on both
paths:

- :func:`media_catalog` — media spans → (doc_id, span_order, kind, media_ref,
  fetch-partition key) with deterministic bucketing so co-located fetches
  batch per storage prefix.
- :func:`decode_media` — mapInPandas over the catalog: resolves each
  media_ref to bytes (``fetcher`` is injectable, like the URL source;
  default is the deterministic offline ``_fake_fetch``), sniffs the
  container, and emits REAL width/height/duration for stdlib-decodable
  formats, stub metadata otherwise.
- :func:`resize_images` — real nearest-neighbor resample (numpy indexing)
  for decodable images; byte-fold stub for opaque blobs.
- :func:`media_features` — Pandas-UDF feature extraction (byte histogram as
  the stand-in for an image/audio encoder), returning fixed-dim float arrays
  that flow into the same similarity/linking operators as text embeddings.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_order", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

FEATURE_DIM = 32


def media_catalog(spans: DataFrame, fetch_buckets: int = 64) -> DataFrame:
    """Media spans with a deterministic fetch-bucket key. Repartitioning by
    the bucket groups refs with a shared storage prefix into the same task —
    at object-store scale this is what turns 10^9 GETs into batched range
    reads per prefix."""
    media = spans.filter(F.col("kind") != "text").select(
        "doc_id", "span_order", "kind", "media_ref"
    )
    bucket = F.pmod(F.hash(F.regexp_extract("media_ref", r"^(m://[^/]+)", 1)),
                    F.lit(fetch_buckets))
    return media.withColumn("fetch_bucket", bucket)


def _fake_fetch(media_ref: str, kind: str) -> bytes:
    """Deterministic stand-in for the object-store fetch + container parse.
    Real implementation: fsspec/boto3 ranged GET → format sniff → decode.
    NOT IMPLEMENTED in this container (no image/audio libs) — synthesizes
    content bytes from the ref hash so downstream shape logic is real."""
    h = hashlib.sha256(media_ref.encode()).digest()
    size = 256 + h[0] * 16
    return (h * ((size // len(h)) + 1))[:size]


def decode_media(catalog: DataFrame, fetcher=None) -> DataFrame:
    """mapInPandas: fetch + decode each media span → MEDIA_SCHEMA rows.

    ``fetcher(media_ref, kind) -> bytes`` is injectable (production: ranged
    object-store GET); the default synthesizes deterministic offline bytes.
    Fetched content is SNIFFED: PNG/BMP/PPM/WAV/baseline-JPEG decode for
    real via functions/mediacodecs (status ``ok``, true width/height/
    duration); formats needing codec libs (MP3/MP4-class, progressive JPEG)
    keep deterministic stub metadata (status ``ok_stub``). Every row raises into ``decode_status`` rather than failing
    the task, so one corrupt object never kills a 10^12-row job (poison-pill
    isolation)."""
    from ..functions import mediacodecs as MC

    fetch = fetcher or _fake_fetch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    content = fetch(row.media_ref, row.kind)
                    probe = MC.probe(content)
                    meta = {"width": None, "height": None, "duration_ms": None}
                    if probe is not None:  # real stdlib-decodable container
                        meta["width"] = probe.get("width")
                        meta["height"] = probe.get("height")
                        meta["duration_ms"] = probe.get("duration_ms")
                        status = "ok"
                    else:
                        h = hashlib.sha256(content).digest()
                        if row.kind == "image":
                            # codec-lib formats (jpeg, …): stub dims
                            meta["width"] = 64 + h[1] * 4
                            meta["height"] = 64 + h[2] * 4
                        elif row.kind == "audio":
                            meta["duration_ms"] = 500 + int.from_bytes(h[3:5], "big")
                        status = "ok_stub"
                    out.append(
                        {
                            "doc_id": row.doc_id,
                            "span_order": row.span_order,
                            "kind": row.kind,
                            "media_ref": row.media_ref,
                            "content": content,
                            "n_bytes": len(content),
                            **meta,
                            "decode_status": status,
                        }
                    )
                except Exception as ex:  # noqa: BLE001 — poison-pill isolation
                    out.append(
                        {
                            "doc_id": row.doc_id,
                            "span_order": row.span_order,
                            "kind": row.kind,
                            "media_ref": row.media_ref,
                            "content": None,
                            "n_bytes": None,
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                            "decode_status": f"error:{type(ex).__name__}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return catalog.repartition("fetch_bucket").mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(decoded: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: one row per sampled frame, uniformly spaced over
    the clip — (doc_id, span_order, media_ref, frame_index, timestamp_ms,
    frame_bytes, decode_status). mapInPandas so a real decoder (pyav/ffmpeg
    seek-and-decode at the sampled timestamps — NOT IMPLEMENTED in this
    container) slots into the same batch shape; the stub slices the container
    bytes deterministically per frame so downstream plumbing is real."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("span_order", T.IntegerType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("timestamp_ms", T.LongType()),
            T.StructField("frame_bytes", T.BinaryType()),
            T.StructField("decode_status", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    content = bytes(row.content)
                    # stub duration: derived from content hash (a real decoder
                    # reads the container header)
                    duration_ms = 1000 + hashlib.sha256(content).digest()[0] * 40
                    step = max(len(content) // n_frames, 1)
                    for i in range(n_frames):
                        out.append(
                            {
                                "doc_id": row.doc_id,
                                "span_order": row.span_order,
                                "media_ref": row.media_ref,
                                "frame_index": i,
                                "timestamp_ms": (duration_ms * i) // n_frames,
                                "frame_bytes": content[i * step:(i + 1) * step]
                                or content[:step],
                                "decode_status": "ok_stub",
                            }
                        )
                except Exception as ex:  # noqa: BLE001 — poison-pill isolation
                    out.append(
                        {
                            "doc_id": row.doc_id,
                            "span_order": row.span_order,
                            "media_ref": row.media_ref,
                            "frame_index": -1,
                            "timestamp_ms": None,
                            "frame_bytes": None,
                            "decode_status": f"error:{type(ex).__name__}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    videos = decoded.filter(
        (F.col("kind") == "video") & F.col("decode_status").startswith("ok")
    ).select("doc_id", "span_order", "media_ref", "content")
    return videos.mapInPandas(run, schema=out_schema)


def resize_images(decoded: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize to a fixed training shape — (…, width, height,
    resized_bytes, decode_status). Decodable containers (PNG/BMP/PPM) get a
    REAL nearest-neighbor resample (numpy index-gather — what
    cv2.INTER_NEAREST computes), status ``ok``; opaque blobs (jpeg-class,
    fake fetches) keep the deterministic byte-fold stub, status ``ok_stub``.
    Batch shape, schema, and per-row isolation are identical on both
    paths."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("span_order", T.IntegerType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized_bytes", T.BinaryType()),
            T.StructField("decode_status", T.StringType()),
        ]
    )
    target = width * height

    from ..functions import mediacodecs as MC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    content = bytes(row.content)
                    img = MC.decode_image_array(content)
                    if img is not None:
                        resized = MC.resize_nearest(img, width, height)
                        status = "ok"
                    else:
                        arr = np.frombuffer(content, dtype=np.uint8)
                        if arr.size == 0:
                            # the fixed-shape contract can't hold for an
                            # empty blob — poison-pill, don't claim ok
                            raise ValueError("empty content")
                        reps = (target // max(arr.size, 1)) + 1
                        resized = np.tile(arr, reps)[:target]
                        status = "ok_stub"
                    out.append(
                        {
                            "doc_id": row.doc_id,
                            "span_order": row.span_order,
                            "media_ref": row.media_ref,
                            "width": width,
                            "height": height,
                            "resized_bytes": resized.tobytes(),
                            "decode_status": status,
                        }
                    )
                except Exception as ex:  # noqa: BLE001
                    out.append(
                        {
                            "doc_id": row.doc_id,
                            "span_order": row.span_order,
                            "media_ref": row.media_ref,
                            "width": None,
                            "height": None,
                            "resized_bytes": None,
                            "decode_status": f"error:{type(ex).__name__}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    images = decoded.filter(
        (F.col("kind") == "image") & F.col("decode_status").startswith("ok")
    ).select("doc_id", "span_order", "media_ref", "content")
    return images.mapInPandas(run, schema=out_schema)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def media_feature_udf(content: pd.Series) -> pd.Series:
    """Fixed-dim feature vector per media blob — byte histogram, L1-normalized
    (the stand-in for a real image/audio encoder; same output contract)."""

    def feat(b: bytes | None) -> list[float]:
        if not b:
            return [0.0] * FEATURE_DIM
        arr = np.frombuffer(b, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        total = hist.sum()
        return (hist / total if total else hist).astype(np.float32).tolist()

    return content.map(feat)


def media_features(decoded: DataFrame) -> DataFrame:
    """(doc_id, span_order, kind, embedding) — flows into similarity ops."""
    return decoded.filter(F.col("decode_status").startswith("ok")).select(
        "doc_id", "span_order", "kind",
        media_feature_udf(F.col("content")).alias("embedding"),
    )
