"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The image/video codec libraries are
NOT in this container, so the codec call itself is stubbed: with
``fake=True`` (default) a deterministic hash-derived feature vector is
produced (schema, partitioning, UDF signature and batch shape are all
real and tested); with ``fake=False`` the stage raises NotImplementedError
at the exact point a real decoder (PIL / ffmpeg) would be invoked.

The audio modality is NOT stubbed — hydra_spark.functions.decode does
real G.711/PCM decode; this module is the pattern generalized to
image/video payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_FEAT_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes, mime: str):
    """Deterministic stand-in for the codec call: dims + features derived
    from a sha256 of the payload. STUB — replace with PIL/ffmpeg decode."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = (np.frombuffer(h[: _FEAT_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0)
    return width, height, feats


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload binary -> (dims, feature vector) over Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            null_mask = payloads.isna()
            if not fake and (~null_mask).any():
                raise NotImplementedError(
                    "real image/video decode requires PIL/ffmpeg (not in container); "
                    "use fake=True for the deterministic stub"
                )
            # one column-wise pass; the per-payload codec call (here the
            # sha256 stub, later PIL/ffmpeg) is the only per-row work
            decoded = [
                None if p is None else _fake_decode(bytes(p), m)
                for p, m in zip(payloads, pdf["mime"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "mime": pdf["mime"].values,
                    "n_bytes": [None if p is None else len(p) for p in payloads],
                    "width": [None if d is None else d[0] for d in decoded],
                    "height": [None if d is None else d[1] for d in decoded],
                    "features": [None if d is None else d[2] for d in decoded],
                    "decode_error": [
                        "null payload" if p is None else None for p in payloads
                    ],
                }
            )
            yield out

    # salt by media_id so one hot mime type cannot skew decode tasks
    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("src_w", T.IntegerType(), True),
        T.StructField("src_h", T.IntegerType(), True),
        T.StructField("dst_w", T.IntegerType(), True),
        T.StructField("dst_h", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("n_bytes_out", T.IntegerType(), True),
        T.StructField("payload_out", T.BinaryType(), True),
    ]
)


def resize_media(df: DataFrame, dst_w: int = 64, dst_h: int = 64, fake: bool = True) -> DataFrame:
    """payload -> downscaled payload at (dst_w, dst_h), Arrow-batched.

    The codec call is stubbed like extract_features: source dims come
    from the deterministic sha256 stub, and "resizing" keeps every k-th
    byte with k = max(1, src_area // dst_area) — a real implementation
    swaps exactly that line for PIL's resize. The byte plumbing is
    real (binary in, binary out, n_bytes_out == len(payload_out)), and
    the whole stage is SQL-checkable end-to-end: dims and output byte
    counts are pure integer arithmetic over sha256(payload), which the
    DuckDB oracle recomputes independently (media_resize row)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    rows.append((mid, None, None, dst_w, dst_h, None, None, None))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image resize requires PIL (not in container); "
                        "use fake=True for the deterministic stub"
                    )
                b = bytes(p)
                w, h, _ = _fake_decode(b, "")
                k = max(1, (w * h) // (dst_w * dst_h))
                out = b[::k]  # len == ceil(len(b) / k), matching the oracle
                rows.append((mid, w, h, dst_w, dst_h, len(b), len(out), out))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.mapInPandas(fn, schema=RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands per-clip frame indexes
    JVM-side (sequence/explode); the per-frame decode would then run in
    extract_features over the (media_id, frame_idx) grain."""
    n_frames = (F.length("payload") / 1024).cast("int")  # stub: 1 KiB ≈ 1 frame
    return df.select(
        "media_id",
        "mime",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_idx"
        ),
    )


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text as an opaque payload for plumbing
    tests in this container (no real image bytes available)."""
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
