"""Segmentation stage: byte parity of the decode-free ragged gather
(functions/segment.py) against a per-row Python slicing oracle, plus
geometry (overlap, tail drop, sub-segment clips), error-row semantics,
and sliced-emission equivalence."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.segment import segment_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(5)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for sr in (8000, 16000, 44100):
            # includes: shorter than one segment (yields 0 rows), exactly
            # one segment, non-integer multiples (tail dropped)
            for dur_ms in (0, 120, 250, 260, 990, 1000):
                n = sr * dur_ms // 1000
                x = (rng.random(n) * 2 - 1) * 0.9
                rows.append((f"c{i:03d}", bytearray(audio.encode(x, codec)), sr, codec))
                i += 1
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), 16000, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), 16000, "mp3"))
    rows.append(("e-sr", bytearray(b"\x01\x02"), 0, "pcm16"))
    return rows


def _oracle(buf, sr, codec, seg_ms, hop_ms):
    """Per-row reference: plain Python byte slicing."""
    bps = 2 if codec == "pcm16" else 1
    n = len(buf) // bps
    seg_len = sr * seg_ms // 1000
    hop = sr * hop_ms // 1000
    if n < seg_len or seg_len < 1 or hop < 1:
        return []
    out = []
    for k in range((n - seg_len) // hop + 1):
        s = k * hop
        out.append((k, s, seg_len, bytes(buf[s * bps : (s + seg_len) * bps])))
    return out


@pytest.mark.parametrize("seg_ms,hop_ms", [(250, 125), (250, 250), (100, 70)])
def test_segment_parity(spark, seg_ms, hop_ms):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(4)
    got = {}
    for r in segment_clips(df, seg_ms=seg_ms, hop_ms=hop_ms).collect():
        got.setdefault(r["clip_id"], []).append(r)
    for cid, buf, sr, codec in rows:
        if cid.startswith("e-"):
            assert len(got[cid]) == 1
            g = got[cid][0]
            assert g["segment_error"] is not None
            assert g["seg_idx"] is None and g["bytes_seg"] is None
            continue
        exp = _oracle(buf, sr, codec, seg_ms, hop_ms)
        have = sorted(got.get(cid, []), key=lambda r: r["seg_idx"])
        assert len(have) == len(exp), (cid, codec, sr)
        for g, (k, s, sl, b) in zip(have, exp):
            assert g["segment_error"] is None
            assert g["seg_idx"] == k and g["start_sample"] == s
            assert g["n_samples_seg"] == sl
            assert bytes(g["bytes_seg"]) == b, (cid, k)


def test_segment_sliced_output_matches_single_slice(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).coalesce(1)

    def key(r):
        return (r["clip_id"], r["seg_idx"])

    base = sorted(segment_clips(df, 250, 125).collect(), key=key)
    sliced = sorted(segment_clips(df, 250, 125, max_slice_bytes=2048).collect(), key=key)
    assert len(base) == len(sliced)
    for b, s in zip(base, sliced):
        assert key(b) == key(s)
        assert b["segment_error"] == s["segment_error"]
        assert (b["bytes_seg"] is None) == (s["bytes_seg"] is None)
        if b["bytes_seg"] is not None:
            assert bytes(b["bytes_seg"]) == bytes(s["bytes_seg"])


def test_segment_rejects_bad_params(spark):
    df = spark.createDataFrame([], schema=SCHEMA)
    with pytest.raises(ValueError):
        segment_clips(df, seg_ms=0)
    with pytest.raises(ValueError):
        segment_clips(df, seg_ms=100, hop_ms=-1)


def test_segment_subsample_window_is_error(spark):
    """sr so low that 250 ms < 1 sample -> loud error row, not a crash
    or a silent drop."""
    df = spark.createDataFrame(
        [("a", bytearray(b"\x00\x00"), 2, "pcm16")], schema=SCHEMA
    )
    g = segment_clips(df, seg_ms=250, hop_ms=125).collect()[0]
    assert "shorter than one sample" in g["segment_error"]


def test_segment_streaming_matches_batch(spark, clips, tmp_path):
    """segment_clips is a stateless mapInArrow stage, so it runs
    unchanged inside Structured Streaming; the streamed segment set
    must equal the batch one (keys, geometry, and bytes via md5)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = os.path.join(str(tmp_path), "src")
    sub = clips.where(F.col("clip_id").endswith("1")).select(
        "clip_id", "bytes", "sr_hz", "codec"
    )
    sub.repartition(4).write.parquet(src)

    def digest(df):
        seg = segment_clips(df, seg_ms=250, hop_ms=125)
        return seg.select(
            "clip_id", "seg_idx", "start_sample",
            F.md5(F.hex("bytes_seg")).alias("h"),
        )

    batch = {tuple(r) for r in digest(spark.read.parquet(src)).collect()}
    stream = spark.readStream.schema(sub.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    out_dir = os.path.join(str(tmp_path), "out")
    q = (
        digest(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert streamed == batch and len(batch) > 100
    shutil.rmtree(str(tmp_path), ignore_errors=True)
