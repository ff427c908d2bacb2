"""Multimodal column handling (extension surface, north star).

Media (image/audio/video) is modeled as an opaque ``binary`` payload
column plus a typed metadata struct — the layout a 100 TB training-data
pipeline uses (parquet binary columns with per-row metadata, processed by
Arrow-batched Python since media codecs are not JVM-side).

The Spark-side plumbing here is REAL and tested: payload schema, batch
iteration shape (``mapInPandas`` — one Arrow batch in, one out, never a
per-row Python hop), partitioning (``ensure_parallelism`` before the
Python stage), and deterministic byte-level features. The actual codec
calls are STUBS: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` (pillow/ffmpeg are not in this container), and
``fake_frame_sample`` is the deterministic stand-in used by tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pmp_analytics_spark.operators.partitioning import ensure_parallelism

PAYLOAD_META_SCHEMA = StructType(
    [
        StructField("content_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("header_hex", StringType()),
        StructField("content_type", StringType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake media payload + metadata to each doc.

    Stands in for reading real media blobs (``spark.read.format
    ('binaryFile')`` or a parquet binary column at deployment): payload =
    utf-8 bytes of the text, metadata derived from byte length. Everything
    downstream (batching, feature extraction, dedup on payload hash) is
    the real pipeline.
    """
    n = F.octet_length(F.col(text_col)).cast("long")
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 2 == 0, F.lit("image/fake")).otherwise(F.lit("audio/fake")).alias(
                "content_type"
            ),
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            n.alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload to pixels. STUB — media codecs are not
    available in this environment; wire pillow/torchvision here at
    deployment."""
    raise NotImplementedError("image decoding requires pillow; not available in this environment")


def decode_audio(payload: bytes) -> object:
    """Decode an audio payload to samples. STUB — see decode_image."""
    raise NotImplementedError("audio decoding requires ffmpeg; not available in this environment")


def fake_frame_sample(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: n_frames equal
    byte-range slices of the payload (replace with real decoder output at
    deployment; keeps the downstream per-frame pipeline testable)."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB — decode→resize→re-encode requires
    pillow; wire it here at deployment. The distributed shape is identical
    to extract_payload_features: mapInPandas batch in, batch out."""
    raise NotImplementedError("image resize requires pillow; not available in this environment")


def _resize_backend():
    """Import-gated codec selection: real pillow resize when the library
    exists, the deterministic byte-truncation fake otherwise (keeps the
    distributed plumbing testable in codec-less environments)."""
    try:  # pragma: no cover - pillow absent in this container
        from PIL import Image  # noqa: F401

        def real(payload: bytes, cap: int) -> bytes:
            import io

            img = Image.open(io.BytesIO(payload))
            img.thumbnail((64, 64))
            buf = io.BytesIO()
            img.save(buf, format=img.format or "PNG")
            return buf.getvalue()

        return real
    except ImportError:
        return lambda payload, cap: payload[:cap]


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("thumb_bytes", LongType()),
        StructField("thumb_md5", StringType()),
    ]
)


def resize_thumbnails(with_payload: DataFrame, cap_bytes: int = 256) -> DataFrame:
    """Distributed thumbnailing: mapInPandas batch in → per-doc thumbnail
    features out. The codec is import-gated (``_resize_backend``): pillow
    when present, the deterministic byte-truncation fake otherwise — the
    Spark-side shape (batching, schema, halved dimensions from the meta
    struct) is identical either way, so the pipeline is fully tested and
    oracle-checkable in this environment and swaps to real decoding with
    zero plan changes."""
    resize = _resize_backend()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [resize(bytes(p), cap_bytes) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": pdf["meta"].map(lambda m: m["width"] // 2).astype("int32"),
                    "out_h": pdf["meta"].map(lambda m: m["height"] // 2).astype("int32"),
                    "thumb_bytes": [len(t) for t in thumbs],
                    "thumb_md5": [hashlib.md5(t).hexdigest() for t in thumbs],
                }
            )

    return ensure_parallelism(with_payload).mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("n_bytes", LongType()),
        StructField("chunk_md5", StringType()),
    ]
)


def chunk_audio(
    with_payload: DataFrame, chunk_bytes: int = 400, stride: int = 300
) -> DataFrame:
    """Overlapping audio chunk windows (the ASR/feature-extraction
    pre-pass): one payload row in → ceil(n/stride) chunk rows out, each a
    ``chunk_bytes`` window at ``stride`` spacing (trailing partial window
    kept). Same mapInPandas fan-out shape as ``sample_frames``; a real
    pipeline decodes samples in the same loop. Purely map-side — a 100 TB
    audio corpus chunks with zero shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "chunk_idx": [], "offset": [], "n_bytes": [], "chunk_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                idx = 0
                for off in range(0, max(len(b), 1), stride):
                    chunk = b[off : off + chunk_bytes]
                    if not chunk:
                        break
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(off)
                    out["n_bytes"].append(len(chunk))
                    out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
                    idx += 1
            yield pd.DataFrame(out)

    return ensure_parallelism(with_payload).mapInPandas(batches, AUDIO_CHUNK_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(with_payload: DataFrame, n_frames: int = 4) -> DataFrame:
    """Per-frame fan-out: one payload row in → ``n_frames`` frame rows out,
    via ``mapInPandas`` (the Python-side set-returning shape — a real video
    pipeline swaps ``fake_frame_sample`` for decoder output, nothing else
    changes). Output rows carry per-frame byte features; empty payloads
    produce no rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(fake_frame_sample(bytes(payload), n_frames)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return ensure_parallelism(with_payload).mapInPandas(batches, FRAME_SCHEMA)


def extract_payload_features(with_payload: DataFrame) -> DataFrame:
    """Byte-level features via ``mapInPandas`` — the real batch shape for
    media feature extraction (decode would slot into the same loop).

    Arrow hands each partition as an iterator of pandas batches; we emit
    one output batch per input batch — constant memory per task, no
    per-row Python calls, and the output schema is fixed/typed so the
    optimizer can prune downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "header_hex": payloads.map(lambda b: b[:8].hex()),
                    "content_type": pdf["meta"].map(lambda m: m["content_type"]),
                }
            )

    return ensure_parallelism(with_payload).mapInPandas(batches, FEATURES_SCHEMA)
