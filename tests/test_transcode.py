"""Transcode stage: byte-for-byte parity of the vectorized engine path
(functions/transcode.py) against the per-row shared-module oracle
(audio.transcode_clip), pass-through semantics, error rows, and
sliced-emission equivalence."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hydra_spark import audio
from hydra_spark.functions.transcode import transcode_clips

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(17)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for n, amp in ((0, 0.0), (700, 0.3), (3000, 0.97)):
            x = (rng.random(n) * 2 - 1) * amp
            rows.append((f"c{i:03d}", bytearray(audio.encode(x, codec)), codec))
            i += 1
    rows.append(("e-null", None, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), "opus"))
    return rows


@pytest.mark.parametrize("to_codec", ["ulaw", "pcm16", "alaw"])
def test_transcode_parity(spark, to_codec):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.clip_id: r for r in transcode_clips(df, to_codec=to_codec).collect()}
    assert len(got) == len(rows)
    for clip_id, buf, codec in rows:
        r = got[clip_id]
        if clip_id.startswith("e-"):
            assert r.tc_error is not None and r.bytes_tc is None and r.n_samples is None
            continue
        want = audio.transcode_clip(bytes(buf), codec, to_codec)
        assert bytes(r.bytes_tc) == want, clip_id
        n_in = len(buf) // 2 if codec == "pcm16" else len(buf)
        assert r.n_samples == n_in
        assert len(r.bytes_tc) == n_in * (2 if to_codec == "pcm16" else 1)
        if codec == to_codec:
            assert bytes(r.bytes_tc) == bytes(buf)  # verbatim pass-through


def test_transcode_sliced_emission_equivalence(spark):
    """Tiny max_slice_bytes forces many output slices; results must be
    identical to the single-slice run."""
    rows = _mk_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    full = {r.clip_id: r.bytes_tc for r in transcode_clips(df, "ulaw").collect()}
    sliced = {
        r.clip_id: r.bytes_tc
        for r in transcode_clips(df, "ulaw", max_slice_bytes=512).collect()
    }
    assert full == sliced


def test_transcode_rejects_bad_target():
    with pytest.raises(ValueError, match="unsupported target codec"):
        transcode_clips(None, to_codec="mp3")


def test_transcode_streaming_matches_batch(spark, clips, tmp_path):
    """transcode_clips is a stateless mapInArrow stage, so it runs
    unchanged in Structured Streaming; streamed output must equal batch
    byte-for-byte (same parity contract as the gain/mask stages)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = os.path.join(str(tmp_path), "src")
    sub = clips.where(F.col("clip_id").endswith("3")).select(
        "clip_id", "bytes", "codec"
    )
    sub.repartition(4).write.parquet(src)

    def digest(df):
        return transcode_clips(df, to_codec="ulaw").select(
            "clip_id", F.md5(F.hex("bytes_tc")).alias("h")
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
    assert q.awaitTermination(300), "availableNow trigger did not finish"
    streamed = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert streamed == batch and len(batch) > 50
    shutil.rmtree(str(tmp_path), ignore_errors=True)
