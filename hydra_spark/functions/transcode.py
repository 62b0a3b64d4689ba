"""Codec transcode — re-encode clips to a target codec in one pass.

Storage-side normalization for a mixed-codec corpus: training pipelines
standardize on one codec (G.711 for 2x smaller archives, pcm16 for
lossless downstream math) before writing the curated table. One
``mapInArrow`` pass sharing the decode stage's zero-copy gather/LUT
machinery; decode AND encode are the single shared ``hydra_spark.audio``
definitions (same elementwise IEEE ops vectorized over the batch), so
the engine output equals the per-row oracle
``audio.encode(audio.decode(buf, codec), to_codec)`` byte-for-byte
(tests/test_transcode.py). Same-codec rows pass through unchanged
(re-compressing an already-companded clip would add quantization error
for zero benefit).

SQL-checkable projection: n_samples is derivable from the input length
per codec and out_bytes = n_samples * (2 if pcm16 else 1), so the
DuckDB oracle (``clips_transcode``) verifies codec dispatch, sample
accounting and output sizing; the companded byte values themselves are
pinned in pytest (float32 log/round math is not safely reproducible in
SQL's float64 round-half-up).

Scale posture (same as resample/gain): transcode runs BEFORE any
shuffle — at 10^12 clips the payload never moves encoded AND decoded;
pcm16 output doubles G.711 input, so output is emitted in size-bounded
Arrow slices (int32-offset guard). Errors are skip-and-count rows
(reference KafkaClientAlgebra.scala:380-395).
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
    _ragged_scatter,
)
from hydra_spark.functions.resample import _MAX_ROW, _MAX_SLICE

OUT_FIELDS = [
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("bytes_tc", T.BinaryType(), True),
    T.StructField("tc_error", T.StringType(), True),
]


def _encode_batch(x: np.ndarray, to_codec: str) -> np.ndarray:
    """Vectorized shared-definition encode: float32 [-1,1] samples ->
    byte array of the target codec (uint8 view for G.711, int16-LE view
    for pcm16). Compress AND quantize are the audio module's own
    functions (not copies), so per-row/vectorized divergence is
    structurally impossible."""
    if to_codec == "pcm16":
        return audio.quantize_pcm16(x)
    if to_codec == "ulaw":
        return audio.quantize_g711(audio._ulaw_compress(x))
    return audio.quantize_g711(audio._alaw_compress(x))


def transcode_clips(
    df: DataFrame, to_codec: str = "ulaw", max_slice_bytes: int = _MAX_SLICE
) -> DataFrame:
    """bytes+codec -> ``bytes_tc`` re-encoded as ``to_codec``.

    Output columns: every non-``bytes`` input column, plus n_samples /
    bytes_tc / tc_error. Error rows (null bytes, unknown codec, odd
    pcm16 length) carry NULL outputs; rows already in the target codec
    pass through byte-identical."""
    if to_codec not in audio.SUPPORTED_CODECS:
        raise ValueError(f"unsupported target codec: {to_codec}")
    if not 1 <= max_slice_bytes <= _MAX_ROW:
        raise ValueError(f"max_slice_bytes must be in [1, {_MAX_ROW}], got {max_slice_bytes}")
    keep = [f for f in df.schema.fields if f.name != "bytes"]
    keep_names = [f.name for f in keep]
    out_schema = T.StructType(keep + OUT_FIELDS)
    bytes_per_out = 2 if to_codec == "pcm16" else 1

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

            n_samp = np.zeros(n, dtype=np.int64)
            is_pcm = codec == "pcm16"
            n_samp[ok & is_pcm] = lens[ok & is_pcm] // 2
            n_samp[ok & ~is_pcm] = lens[ok & ~is_pcm]
            out_bytes = n_samp * bytes_per_out
            too_big = out_bytes > _MAX_ROW
            if too_big.any():
                err[too_big] = "ValueError: transcoded output exceeds 2 GiB"
                err_mask = err != None  # noqa: E711
                ok = ~err_mask
                n_samp[too_big] = 0
                out_bytes[too_big] = 0

            a = 0
            while a < n:
                b = a + 1
                tot = int(out_bytes[a])
                while b < n and tot + int(out_bytes[b]) <= max_slice_bytes:
                    tot += int(out_bytes[b])
                    b += 1
                m = b - a
                codec_s = codec[a:b]
                lens_s = lens[a:b]
                heads_abs = off[:-1][a:b]
                ok_s = ok[a:b]
                n_samp_s = n_samp[a:b]
                err_mask_s = err_mask[a:b]

                out_heads = np.zeros(m, dtype=np.int64)
                np.cumsum(out_bytes[a:b][:-1], out=out_heads[1:])
                out_buf = np.zeros(int(out_bytes[a:b].sum()), dtype=np.uint8)

                CHUNK = 1 << 18
                for c in audio.SUPPORTED_CODECS:
                    mask = (codec_s == c) & ok_s
                    if not mask.any():
                        continue
                    rows = np.nonzero(mask)[0]
                    seg = lens_s[rows]
                    start = 0
                    while start < len(rows):
                        end = start + 1
                        tot_in = int(seg[start])
                        while end < len(rows) and tot_in + seg[end] <= CHUNK:
                            tot_in += int(seg[end])
                            end += 1
                        r_c = rows[start:end]
                        s_c = seg[start:end]
                        start = end
                        gathered = _ragged_gather(data, heads_abs[r_c], s_c)
                        if c == to_codec:
                            # pass-through: copy source bytes verbatim
                            _ragged_scatter(out_buf, out_heads[r_c], s_c, gathered)
                            continue
                        if c == "pcm16":
                            x = gathered.view("<i2").astype(np.float32)
                            x /= np.float32(32767.0)
                            sl = s_c // 2
                        else:
                            x = _LUT[c][gathered]
                            sl = s_c
                        enc = _encode_batch(x, to_codec)
                        _ragged_scatter(
                            out_buf, out_heads[r_c], sl * bytes_per_out, enc.view(np.uint8)
                        )

                offsets = np.zeros(m + 1, dtype=np.int32)
                offsets[1:] = np.cumsum(out_bytes[a:b]).astype(np.int32)
                bin_bufs = [None, pa.py_buffer(offsets), pa.py_buffer(out_buf)]
                null_count = 0
                if err_mask_s.any():
                    bin_bufs[0] = pa.py_buffer(np.packbits(~err_mask_s, bitorder="little"))
                    null_count = int(err_mask_s.sum())
                bytes_tc = pa.Array.from_buffers(pa.binary(), m, bin_bufs, null_count=null_count)

                arrays = [rb.column(names.index(k)).slice(a, m) for k in keep_names] + [
                    pa.array(n_samp_s.astype(np.int32), type=pa.int32(), mask=err_mask_s),
                    bytes_tc,
                    pa.array(err[a:b], type=pa.string(), from_pandas=True),
                ]
                yield pa.RecordBatch.from_arrays(
                    arrays, names=keep_names + [f.name for f in OUT_FIELDS]
                )
                a = b

    return df.mapInArrow(fn, schema=out_schema)
