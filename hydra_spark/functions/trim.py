"""Silence trimming — strip leading/trailing silent runs, decode-free emission.

Training pipelines trim edge silence before segmentation/tokenization so
padding doesn't dilute features or waste tokens (the reference's
record-transform slot — core/src/main/scala/hydra/core/transport/
RecordFactory.scala:25-30 — is where such per-record rewrites run).

Spark-first shape: one ``mapInArrow`` stage. The DECISION needs decode
(silence is a property of decoded PCM: |x| <= audio.SILENCE_EPS, the
same definition as the n_silent stat), but the EMISSION does not — a
sample boundary is a byte boundary in every supported codec, so the
trimmed payload is a single ragged byte gather from the ORIGINAL encoded
buffer (same trick as functions/segment.py): bytes are never re-encoded,
output <= input, int32 Arrow offsets can't wrap.

Boundary search is fully vectorized across the chunk: decode the chunk
per codec (LUT / int16 view, identical values to the decode stage), one
``flatnonzero(|x| > eps)`` over the concatenated samples, then two
``searchsorted`` calls recover each row's first/last non-silent index —
no per-row Python. All-silent clips emit n_out = 0 with EMPTY (not
null) bytes, the audio.lead_trail_silent convention (lead = n,
trail = 0). Error rows (null bytes, unknown codec, odd pcm16) carry
``trim_error`` — skip-and-count, never exceptions (reference
KafkaClientAlgebra.scala:380-395).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, types as T

from hydra_spark import audio
from hydra_spark.functions.decode import (
    _LUT,
    _binary_views,
    _classify_errors,
    _ragged_gather,
)

OUT_FIELDS = [
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("n_lead", T.IntegerType(), True),
    T.StructField("n_trail", T.IntegerType(), True),
    T.StructField("n_samples_out", T.IntegerType(), True),
    T.StructField("bytes_trim", T.BinaryType(), True),
    T.StructField("trim_error", T.StringType(), True),
]


def _lead_trail_chunk(x: np.ndarray, counts: np.ndarray, eps) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized audio.lead_trail_silent over a concatenated chunk:
    ``x`` holds ``counts[i]`` samples per row, back to back."""
    roff = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=roff[1:])
    nz = np.flatnonzero(np.abs(x) > eps)
    first = np.searchsorted(nz, roff[:-1], side="left")
    last = np.searchsorted(nz, roff[1:], side="left") - 1
    has = last >= first  # row contains at least one non-silent sample
    lead = counts.copy()  # all-silent convention: lead = n, trail = 0
    trail = np.zeros(len(counts), dtype=np.int64)
    lead[has] = nz[first[has]] - roff[:-1][has]
    trail[has] = roff[1:][has] - 1 - nz[last[has]]
    return lead, trail


def trim_silence(df: DataFrame, eps: float | None = None) -> DataFrame:
    """bytes+codec -> original columns (minus bytes) + n_samples /
    n_lead / n_trail / n_samples_out / bytes_trim / trim_error."""
    eps = np.float32(audio.SILENCE_EPS if eps is None else eps)
    keep = [f for f in df.schema.fields if f.name != "bytes"]
    out_schema = T.StructType(keep + OUT_FIELDS)
    keep_names = [f.name for f in keep]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            names = rb.schema.names
            barr = rb.column(names.index("bytes"))
            codec = np.asarray(rb.column(names.index("codec")).to_pylist(), dtype=object)
            off, data, lens, is_null = _binary_views(barr, n)
            err = _classify_errors(codec, lens, is_null)
            err_mask = err != None  # noqa: E711
            ok = ~err_mask

            bps = np.where(codec == "pcm16", 2, 1).astype(np.int64)
            ns = np.where(ok, lens // bps, 0)
            lead = np.zeros(n, dtype=np.int64)
            trail = np.zeros(n, dtype=np.int64)
            for c in audio.SUPPORTED_CODECS:
                mask = (codec == c) & ok
                if not mask.any():
                    continue
                rows = np.nonzero(mask)[0]
                gathered = _ragged_gather(data, off[:-1][rows], lens[rows])
                if c == "pcm16":
                    x = gathered.view("<i2").astype(np.float32)
                    x /= np.float32(32767.0)
                else:
                    x = _LUT[c][gathered]
                lead[rows], trail[rows] = _lead_trail_chunk(x, ns[rows], eps)

            n_out = np.where(ok, ns - lead - trail, 0)
            src_start = off[:-1] + np.where(ok, lead * bps, 0)
            out_bytes = np.where(ok, n_out * bps, 0)

            flat = _ragged_gather(data, src_start, out_bytes)
            offsets = np.zeros(n + 1, dtype=np.int32)
            offsets[1:] = np.cumsum(out_bytes).astype(np.int32)
            bin_bufs = [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
            null_count = 0
            if err_mask.any():
                bin_bufs[0] = pa.py_buffer(np.packbits(ok, bitorder="little"))
                null_count = int(err_mask.sum())
            bytes_trim = pa.Array.from_buffers(pa.binary(), n, bin_bufs, null_count=null_count)

            arrays = [rb.column(names.index(k)) for k in keep_names] + [
                pa.array(ns.astype(np.int32), type=pa.int32(), mask=err_mask),
                pa.array(lead.astype(np.int32), type=pa.int32(), mask=err_mask),
                pa.array(trail.astype(np.int32), type=pa.int32(), mask=err_mask),
                pa.array(n_out.astype(np.int32), type=pa.int32(), mask=err_mask),
                bytes_trim,
                pa.array(err, type=pa.string(), from_pandas=True),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=keep_names + [f.name for f in OUT_FIELDS]
            )

    return df.mapInArrow(fn, schema=out_schema)
