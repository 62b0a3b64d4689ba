"""Silence trim stage (functions/trim.py): per-row parity of the
vectorized boundary search + decode-free gather against the shared
definition audio.lead_trail_silent, plus edge cases (all-silent, empty,
no-silence, error rows)."""

import numpy as np
from pyspark.sql import functions as F, types as T

from hydra_spark import audio
from hydra_spark.functions.trim import trim_silence

SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(11)
    rows = []
    i = 0
    for codec in audio.SUPPORTED_CODECS:
        for lead, body, trail in [
            (0, 400, 0),      # nothing to trim
            (37, 400, 11),    # both ends
            (160, 0, 160),    # all silent (body 0)
            (0, 0, 0),        # empty clip
            (399, 1, 0),      # single live sample at the end
        ]:
            x = np.concatenate(
                [
                    np.zeros(lead, dtype=np.float32),
                    (rng.random(body).astype(np.float32) * 0.8 + 0.1)
                    * np.where(rng.random(body) < 0.5, -1, 1).astype(np.float32),
                    np.zeros(trail, dtype=np.float32),
                ]
            )
            rows.append((f"c{i:03d}", bytearray(audio.encode(x, codec)), 8000, codec))
            i += 1
    rows.append(("e-null", None, 8000, "pcm16"))
    rows.append(("e-odd", bytearray(b"\x01\x02\x03"), 8000, "pcm16"))
    rows.append(("e-codec", bytearray(b"\x01\x02"), 8000, "mp3"))
    return rows


def test_trim_matches_shared_definition(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.clip_id: r for r in trim_silence(df).collect()}
    assert len(got) == len(rows)  # exactly one output row per input row
    for cid, buf, _sr, codec in rows:
        r = got[cid]
        if cid.startswith("e-"):
            assert r.trim_error is not None and r.bytes_trim is None
            assert r.n_samples is None and r.n_samples_out is None
            continue
        x = audio.decode(bytes(buf), codec)
        lead, trail = audio.lead_trail_silent(x)
        n_out = len(x) - lead - trail
        assert (r.n_samples, r.n_lead, r.n_trail, r.n_samples_out) == (
            len(x), lead, trail, n_out,
        ), cid
        bps = 2 if codec == "pcm16" else 1
        assert bytes(r.bytes_trim) == bytes(buf)[lead * bps : (len(x) - trail) * bps], cid
        # trimmed payload decodes to the non-silent span exactly
        if n_out:
            assert np.array_equal(audio.decode(bytes(r.bytes_trim), codec), x[lead : len(x) - trail])


def test_trim_keeps_passthrough_columns(spark):
    df = spark.createDataFrame(_mk_rows(), SCHEMA).withColumn(
        "tag", F.concat(F.lit("t-"), F.col("clip_id"))
    )
    out = trim_silence(df).select("clip_id", "tag", "sr_hz").collect()
    assert all(r.tag == f"t-{r.clip_id}" and r.sr_hz == 8000 for r in out)


def test_trim_streaming_matches_batch(spark, clips, tmp_path):
    """trim_silence is a stateless mapInArrow stage, so it runs
    unchanged in Structured Streaming; streamed output must equal batch
    byte-for-byte (same parity contract as the gain/mask/transcode
    stages)."""
    import os
    import shutil

    src = os.path.join(str(tmp_path), "src")
    sub = clips.where(F.col("clip_id").endswith("7")).select("clip_id", "bytes", "codec")
    sub.repartition(4).write.parquet(src)

    def digest(df):
        return trim_silence(df).select(
            "clip_id", "n_lead", "n_trail", F.md5(F.hex("bytes_trim")).alias("h")
        )

    batch = {tuple(r) for r in digest(spark.read.parquet(src)).collect()}
    stream = spark.readStream.schema(sub.schema).option("maxFilesPerTrigger", 2).parquet(src)
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
