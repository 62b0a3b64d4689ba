"""Content-fingerprint dedup: batch canonical selection + the streaming
dropDuplicatesWithinWatermark form over the clips stream."""

import os
import shutil

from pyspark.sql import functions as F

from hydra_spark.ops.dedup import (
    content_fingerprint_dedup,
    content_fingerprint_dedup_stream,
)


def _with_dups(clips):
    dups = (
        clips.where(F.col("clip_id").endswith("0"))
        .withColumn("clip_id", F.concat(F.col("clip_id"), F.lit("-dup")))
        .withColumn("event_time", F.col("event_time") + F.expr("interval 5 seconds"))
    )
    return clips.unionByName(dups), dups.count()


def test_batch_fingerprint_dedup(spark, clips):
    u, n_dups = _with_dups(clips)
    out = content_fingerprint_dedup(u).cache()
    n_clips = clips.count()
    assert out.count() == n_clips  # every payload distinct in the fixture
    # the injected copy is always 5 s later -> originals always win
    assert out.where(F.col("clip_id").endswith("-dup")).count() == 0
    assert out.where(F.col("n_copies") == 2).count() == n_dups
    assert out.where(F.col("n_copies") == 1).count() == n_clips - n_dups
    out.unpersist()


def test_batch_fingerprint_hex_form_matches_raw(spark, clips):
    """hex_for_oracle changes the digest, not the dedup semantics."""
    u, _ = _with_dups(clips)
    raw = content_fingerprint_dedup(u, hex_for_oracle=False)
    hx = content_fingerprint_dedup(u, hex_for_oracle=True)
    a = {(r["clip_id"], r["n_copies"]) for r in raw.collect()}
    b = {(r["clip_id"], r["n_copies"]) for r in hx.collect()}
    assert a == b


def test_streaming_fingerprint_dedup(spark, clips, tmp_path):
    """Streaming form: one surviving row per distinct payload; duplicate
    arrivals inside the watermark horizon are dropped; state keys are
    digests (payload column is dropped before the stateful op)."""
    src = os.path.join(str(tmp_path), "src")
    u, _ = _with_dups(clips)
    u.select("clip_id", "bytes", "event_time").repartition(4).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    deduped = content_fingerprint_dedup_stream(stream, watermark="10 minutes")
    assert "bytes" not in deduped.columns  # state never holds payloads

    out_dir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    n_clips = clips.count()
    assert got.count() == n_clips
    assert got.select("fingerprint").distinct().count() == n_clips
    # fingerprint set equals the batch form's
    batch_fps = {r["fingerprint"] for r in content_fingerprint_dedup(u).collect()}
    stream_fps = {r["fingerprint"] for r in got.select("fingerprint").collect()}
    assert stream_fps == batch_fps
    shutil.rmtree(str(tmp_path), ignore_errors=True)
