"""Audio segmentation — fixed-duration windows with hop over raw payload.

Training pipelines slice long clips into fixed-duration (often
overlapping) segments before featurization/augmentation; the reference's
transform slot is where that runs (record-transform stage, reference:
core/src/main/scala/hydra/core/transport/RecordFactory.scala:25-30).
Spark-first shape: one ``mapInArrow`` stage that needs NO DECODE AT ALL —
segment boundaries are sample arithmetic, and a sample boundary is a byte
boundary in every supported codec (pcm16: 2 B/sample, G.711: 1 B/sample),
so each output segment is a pure ragged byte gather from the input Arrow
buffer. No per-row Python (input_hint mandate), no float math, and the
payload is touched exactly once.

Output rows are emitted in output-size-bounded slices (multiple
RecordBatches per input batch) at SEGMENT granularity — overlap (hop <
seg) amplifies output bytes past the input batch size, and unlike the
resample stage one input row here fans out to many output cells, so the
bound applies to the segment stream, not input rows. int32 Arrow offsets
can therefore never wrap.

Scale posture: segmentation runs BEFORE any shuffle; emitting segments
with their (clip_id, seg_idx) key makes the downstream window/dedup
shuffle move segment rows, never re-derive them. The whole verification
story is SQL-expressible: the DuckDB oracle reproduces every segment's
bytes via hex-string slicing (hex is injective and position-preserving),
so the registry row ``clips_segment`` byte-checks the gather itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, types as T

from hydra_spark.functions.decode import (
    _binary_views,
    _classify_errors,
    _ragged_gather,
    _ragged_index,
)
from hydra_spark.functions.resample import _MAX_ROW, _MAX_SLICE

OUT_FIELDS = [
    T.StructField("seg_idx", T.IntegerType(), True),
    T.StructField("start_sample", T.LongType(), True),
    T.StructField("n_samples_seg", T.IntegerType(), True),
    T.StructField("bytes_seg", T.BinaryType(), True),
    T.StructField("segment_error", T.StringType(), True),
]


def segment_clips(
    df: DataFrame,
    seg_ms: int = 1000,
    hop_ms: int | None = None,
    max_slice_bytes: int = _MAX_SLICE,
) -> DataFrame:
    """bytes+codec+sr_hz -> one row per fixed-duration segment.

    Per-row segment geometry (all integer arithmetic, so the DuckDB
    oracle reproduces it exactly): seg_len = sr_hz*seg_ms//1000 samples,
    hop = sr_hz*hop_ms//1000 samples, n_seg = (n_samples-seg_len)//hop+1
    full segments (tail shorter than seg_len is dropped; a clip shorter
    than one segment yields zero rows). Output columns: every
    non-``bytes`` input column, plus seg_idx / start_sample /
    n_samples_seg / bytes_seg (same codec as input) / segment_error.

    Error rows (null bytes, unknown codec, odd pcm16 length,
    non-positive sr_hz, sub-sample seg/hop, >2 GiB single-row output)
    yield ONE output row with NULL segment fields and a non-null
    ``segment_error`` — skip-and-count, never exceptions (reference
    KafkaClientAlgebra.scala:380-395).
    """
    if seg_ms <= 0:
        raise ValueError(f"seg_ms must be positive, got {seg_ms}")
    hop_ms = seg_ms if hop_ms is None else hop_ms
    if hop_ms <= 0:
        raise ValueError(f"hop_ms must be positive, got {hop_ms}")
    if not 1 <= max_slice_bytes <= _MAX_ROW:
        # a bound past int32 range would silently re-break the offset
        # guard this parameter exists to enforce
        raise ValueError(f"max_slice_bytes must be in [1, {_MAX_ROW}], got {max_slice_bytes}")
    import pyarrow as pa

    keep = [f for f in df.schema.fields if f.name != "bytes"]
    out_schema = T.StructType(keep + OUT_FIELDS)
    keep_names = [f.name for f in keep]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            names = rb.schema.names
            if n == 0:
                continue
            barr = rb.column(names.index("bytes"))
            codec = np.asarray(rb.column(names.index("codec")).to_pylist(), dtype=object)
            sr = np.asarray(
                rb.column(names.index("sr_hz")).to_pandas().fillna(0).to_numpy(),
                dtype=np.int64,
            )
            off, data, lens, is_null = _binary_views(barr, n)
            err = _classify_errors(codec, lens, is_null, sr=sr)

            bps = np.where(codec == "pcm16", 2, 1).astype(np.int64)
            seg_len = sr * seg_ms // 1000
            hop = sr * hop_ms // 1000
            ok0 = err == None  # noqa: E711
            sub = ok0 & ((seg_len < 1) | (hop < 1))
            err[sub] = "ValueError: segment or hop shorter than one sample"
            ok = err == None  # noqa: E711

            n_samp = np.where(ok, lens // bps, 0)
            n_seg = np.zeros(n, dtype=np.int64)
            full = ok & (n_samp >= seg_len)
            n_seg[full] = (n_samp[full] - seg_len[full]) // hop[full] + 1
            row_out = n_seg * seg_len * bps  # total output bytes per row
            too_big = row_out > _MAX_ROW
            if too_big.any():
                err[too_big] = "ValueError: segmented output exceeds 2 GiB"
                ok = err == None  # noqa: E711
                n_seg[too_big] = 0
            err_mask = ~ok

            # flatten to the OUTPUT-row stream: ok rows fan out to n_seg
            # segment rows, error rows contribute exactly one null row
            counts = np.where(err_mask, 1, n_seg)
            total = int(counts.sum())
            if total == 0:
                continue
            row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            seg_of = _ragged_index(np.zeros(n, dtype=np.int64), counts).astype(np.int64)
            err_of = err_mask[row_of]
            start_samp = np.where(err_of, 0, seg_of * hop[row_of])
            seg_bytes = np.where(err_of, 0, seg_len[row_of] * bps[row_of])
            src_start = off[:-1][row_of] + start_samp * bps[row_of]

            # segment-granular output slices: cumulative bytes bound each
            # emitted RecordBatch so int32 offsets stay safe under overlap
            csum = np.cumsum(seg_bytes)
            p = 0
            while p < total:
                limit = (csum[p - 1] if p else 0) + max(int(seg_bytes[p]), max_slice_bytes)
                q = int(np.searchsorted(csum, limit, side="right"))
                q = max(q, p + 1)
                m = q - p
                rsel = row_of[p:q]
                e_of = err_of[p:q]
                sb = seg_bytes[p:q]

                flat = _ragged_gather(data, src_start[p:q], sb)
                offsets = np.zeros(m + 1, dtype=np.int32)
                offsets[1:] = np.cumsum(sb).astype(np.int32)
                bin_bufs = [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
                null_count = 0
                if e_of.any():
                    bin_bufs[0] = pa.py_buffer(np.packbits(~e_of, bitorder="little"))
                    null_count = int(e_of.sum())
                bytes_seg = pa.Array.from_buffers(pa.binary(), m, bin_bufs, null_count=null_count)

                take = pa.array(rsel, type=pa.int64())
                arrays = [
                    pa.compute.take(rb.column(names.index(k)), take) for k in keep_names
                ] + [
                    pa.array(seg_of[p:q].astype(np.int32), type=pa.int32(), mask=e_of),
                    pa.array(start_samp[p:q], type=pa.int64(), mask=e_of),
                    pa.array(seg_len[rsel].astype(np.int32), type=pa.int32(), mask=e_of),
                    bytes_seg,
                    pa.array(err[rsel], type=pa.string(), from_pandas=True),
                ]
                yield pa.RecordBatch.from_arrays(
                    arrays, names=keep_names + [f.name for f in OUT_FIELDS]
                )
                p = q

    return df.mapInArrow(fn, schema=out_schema)
