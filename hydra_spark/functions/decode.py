"""Vectorized decode stage — Hydra's record-factory transform as Arrow UDFs.

Hydra transforms payload string -> typed, schema-validated record in
RecordFactory (reference: core/src/main/scala/hydra/core/transport/
RecordFactory.scala:25-30) with per-format dispatch
(ingestors/kafka/src/main/scala/hydra/kafka/producer/
KafkaRecordFactories.scala:21-47) and bad-record skip-and-count
(KafkaClientAlgebra.scala:380-395). Here that stage is ``mapInPandas``
over Arrow batches: codec dispatch per batch, numpy decode per clip,
failures become an ``decode_error`` column (never an exception — the
stream must not die on a bad record).

Two paths:
  * decode_features — the HOT path. Emits per-clip scalar features
    (n_samples, rms_db, peak) and drops the raw bytes so the shuffle that
    follows (window/join) moves ~100 B/row, not ~30 KB/row. At 10^12-clip
    scale, not shuffling audio payloads is the single biggest win.
  * decode_pcm — parity/test path. Emits the full float32 PCM array for
    SNR comparison against the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from hydra_spark import audio

FEATURE_FIELDS = [
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("rms_db", T.DoubleType(), True),
    T.StructField("peak", T.DoubleType(), True),
    T.StructField("decode_error", T.StringType(), True),
]


def _decode_one(buf, codec: str):
    try:
        return audio.decode(buf, codec), None
    except Exception as e:  # skip + count, never fail the stream
        return None, f"{type(e).__name__}: {e}"


def decode_features(df: DataFrame) -> DataFrame:
    """bytes+codec -> scalar features; bytes column is dropped after decode."""
    keep = [f for f in df.schema.fields if f.name != "bytes"]
    out_schema = T.StructType(keep + FEATURE_FIELDS)
    keep_names = [f.name for f in keep]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ns = np.zeros(n, dtype=np.int32)
            rms = np.full(n, np.nan)
            peak = np.full(n, np.nan)
            err: list[str | None] = [None] * n
            bufs = pdf["bytes"].tolist()
            codecs = pdf["codec"].tolist()
            for k in range(n):
                x, e = _decode_one(bufs[k], codecs[k])
                if e is not None:
                    err[k] = e
                    continue
                ns[k] = len(x)
                if len(x):
                    p = float(np.dot(x, x)) / len(x)
                    rms[k] = 10.0 * np.log10(p) if p > 0 else -np.inf
                    peak[k] = float(np.max(np.abs(x)))
            out = pdf[keep_names].copy()
            out["n_samples"] = ns
            out["rms_db"] = rms
            out["peak"] = peak
            out["decode_error"] = pd.Series(err, dtype=object)
            yield out

    return df.mapInPandas(fn, schema=out_schema)


def decode_pcm(df: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """Parity path: emit full float32 PCM (array<float>) + decode_error."""
    keep_cols = keep_cols or ["clip_id", "sr_hz", "dur_ms", "codec"]
    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols]
        + [
            T.StructField("pcm", T.ArrayType(T.FloatType()), True),
            T.StructField("decode_error", T.StringType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcms, errs = [], []
            for buf, codec in zip(pdf["bytes"], pdf["codec"]):
                x, e = _decode_one(buf, codec)
                pcms.append(None if x is None else x)
                errs.append(e)
            out = pdf[keep_cols].copy()
            out["pcm"] = pcms
            out["decode_error"] = pd.Series(errs, dtype=object)
            yield out

    return df.mapInPandas(fn, schema=out_schema)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) after decode — Hydra skip-and-count semantics."""
    return (
        df.where(F.col("decode_error").isNull()),
        df.where(F.col("decode_error").isNotNull()),
    )
