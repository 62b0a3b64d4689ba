"""Gain stage: byte-for-byte parity of the vectorized engine path
(functions/gain.py) against the per-row shared-module oracle
(audio.gain_clip), plus silent passthrough, peak values, error rows,
and sliced-emission equivalence."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.gain import gain_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(9)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for n, amp in ((0, 0.0), (800, 0.2), (4000, 0.95), (2500, 0.0)):
            x = (rng.random(n) * 2 - 1) * amp  # amp 0 -> digital silence
            rows.append((f"c{i:03d}", bytearray(audio.encode(x, codec)), 16000, codec))
            i += 1
    rows.append(("e-null", None, 16000, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), 16000, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), 16000, "mp3"))
    return rows


@pytest.mark.parametrize("target", [0.9, 0.5])
def test_gain_parity(spark, target):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(3)
    got = {r["clip_id"]: r for r in gain_clips(df, target_peak=target).collect()}
    assert len(got) == len(rows)
    for cid, buf, _, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["gain_error"] is not None and g["bytes_gain"] is None
            continue
        assert g["gain_error"] is None
        expected = audio.gain_clip(bytes(buf), codec, target)
        assert bytes(g["bytes_gain"]) == expected, (cid, codec, target)
        x = audio.decode(bytes(buf), codec)
        exp_peak = float(np.max(np.abs(x.astype(np.float64)))) if len(x) else 0.0
        assert g["peak_in"] == exp_peak
        if len(x) and exp_peak > 0:
            y = np.frombuffer(bytes(g["bytes_gain"]), dtype="<i2") / 32767.0
            assert abs(float(np.max(np.abs(y))) - target) < 2e-4  # 1 LSB quantizer


def test_gain_sliced_output_matches_single_slice(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).coalesce(1)
    base = {r["clip_id"]: r for r in gain_clips(df).collect()}
    sliced = {r["clip_id"]: r for r in gain_clips(df, max_slice_bytes=4096).collect()}
    assert set(base) == set(sliced)
    for cid in base:
        b, s = base[cid], sliced[cid]
        assert (b["bytes_gain"] is None) == (s["bytes_gain"] is None)
        if b["bytes_gain"] is not None:
            assert bytes(b["bytes_gain"]) == bytes(s["bytes_gain"]), cid


def test_gain_validates_params(spark):
    df = spark.createDataFrame([], schema=SCHEMA)
    with pytest.raises(ValueError):
        gain_clips(df, target_peak=0.0)
    with pytest.raises(ValueError):
        gain_clips(df, target_peak=1.5)
    with pytest.raises(ValueError):
        gain_clips(df, max_slice_bytes=1 << 33)


def test_gain_and_mask_streaming_match_batch(spark, clips, tmp_path):
    """gain_clips and time_mask are stateless mapInArrow stages (mask's
    position columns are pure projections), so both run unchanged in
    Structured Streaming; streamed output must equal batch byte-for-byte."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from hydra_spark.functions.mask import time_mask

    src = os.path.join(str(tmp_path), "src")
    sub = clips.where(F.col("clip_id").endswith("7")).select(
        "clip_id", "bytes", "sr_hz", "codec"
    )
    sub.repartition(4).write.parquet(src)

    def digest(df):
        g = gain_clips(df, target_peak=0.9).select(
            "clip_id", F.md5(F.hex("bytes_gain")).alias("hg")
        )
        m = time_mask(df, "0.1", salt="st").select(
            "clip_id", F.md5(F.hex("bytes_masked")).alias("hm")
        )
        return g.join(m, "clip_id")

    batch = {tuple(r) for r in digest(spark.read.parquet(src)).collect()}
    # streaming: run the two stages as separate sinks (stream-stream
    # equijoin without watermarks isn't the point here)
    outs = {}
    for name, stage in (
        ("g", lambda d: gain_clips(d, target_peak=0.9).select(
            "clip_id", F.md5(F.hex("bytes_gain")).alias("h"))),
        ("m", lambda d: time_mask(d, "0.1", salt="st").select(
            "clip_id", F.md5(F.hex("bytes_masked")).alias("h"))),
    ):
        stream = spark.readStream.schema(sub.schema).option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        out_dir = os.path.join(str(tmp_path), f"out_{name}")
        q = (
            stage(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(str(tmp_path), f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        outs[name] = {r.clip_id: r.h for r in spark.read.parquet(out_dir).collect()}
    streamed = {(c, outs["g"][c], outs["m"][c]) for c in outs["g"]}
    assert streamed == batch and len(batch) > 50
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_rms_normalize_parity(spark):
    """RMS mode: byte parity vs audio.gain_clip_rms, peak_in carries
    the pre-gain RMS, silent passthrough, achieved RMS ~= target
    (modulo the [-1,1] clip + 1 LSB quantization)."""
    from hydra_spark.functions.gain import rms_normalize_clips

    target = 0.1
    rows = _mk_rows()
    df = spark.createDataFrame(rows, schema=SCHEMA).repartition(3)
    got = {r["clip_id"]: r for r in rms_normalize_clips(df, target_rms=target).collect()}
    assert len(got) == len(rows)
    for cid, buf, _, codec in rows:
        g = got[cid]
        if cid.startswith("e-"):
            assert g["gain_error"] is not None and g["bytes_gain"] is None
            continue
        assert g["gain_error"] is None
        expected = audio.gain_clip_rms(bytes(buf), codec, target)
        assert bytes(g["bytes_gain"]) == expected, (cid, codec)
        x = audio.decode(bytes(buf), codec)
        if len(x) == 0:
            assert g["peak_in"] == 0.0
            continue
        xd = x.astype(np.float64)
        exp_rms = float(np.sqrt(np.add.reduceat(np.square(x, dtype=np.float64), [0])[0] / len(xd)))
        assert g["peak_in"] == exp_rms
        if exp_rms > 0:
            y = np.frombuffer(bytes(g["bytes_gain"]), dtype="<i2") / 32767.0
            got_rms = float(np.sqrt(np.mean(np.square(y))))
            # amp-0.2 rows scale up without clipping; amp-0.95 rows were
            # ALREADY louder than target so they scale down — both land
            # on target within quantization error
            assert abs(got_rms - target) < 1e-3, (cid, got_rms)


def test_gain_mode_validation(spark):
    from hydra_spark.functions.gain import gain_clips as gc

    df = spark.createDataFrame(_mk_rows(), schema=SCHEMA)
    with pytest.raises(ValueError, match="mode"):
        gc(df, mode="loudness")
    with pytest.raises(ValueError, match="target_rms"):
        gc(df, mode="rms", target_rms=0.0)
