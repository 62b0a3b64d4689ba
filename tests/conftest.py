import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from hydra_spark.session import get_spark  # noqa: E402
from hydra_spark import synth  # noqa: E402

TEST_ROOT = "/root/repo/.data/tests"
N = 2000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="hydra_tests", driver_memory="16g")
    yield s


@pytest.fixture(scope="session")
def dataset(spark):
    """Deterministic clips dataset (cached across runs)."""
    return synth.ensure_dataset(spark, TEST_ROOT, n=N)


@pytest.fixture(scope="session")
def clips(spark, dataset):
    return spark.read.parquet(dataset["clips"])


def flush_sentinels(spark, audio_dir, transcripts_dir, base_ts="2025-01-02 00:00:00", rounds=2):
    """Append far-future sentinel rows to both streams so the watermark
    advances past all real data and pending left-outer/agg state flushes.
    Two rounds: watermark updates at end of batch N, emission happens in
    batch N+1."""
    from pyspark.sql import functions as F

    for r in range(rounds):
        ts = F.lit(base_ts).cast("timestamp") + F.expr(f"interval {r * 10} minutes")
        aud = spark.range(1).select(
            F.concat(F.lit("sentinel-a"), F.lit(r)).alias("clip_id"),
            F.lit(b"\x00\x00").alias("bytes"),
            F.lit(8000).alias("sr_hz"),
            F.lit(200).alias("dur_ms"),
            F.lit("pcm16").alias("codec"),
            F.lit(0).cast("int").alias("ingest_partition"),
            F.lit(10**9 + r).cast("long").alias("ingest_offset"),
            ts.alias("event_time"),
        )
        aud.coalesce(1).write.mode("append").parquet(audio_dir)
        tr = spark.range(1).select(
            F.concat(F.lit("sentinel-t"), F.lit(r)).alias("clip_id"),
            F.lit("sentinel").alias("transcript"),
            ts.alias("event_time"),
        )
        tr.coalesce(1).write.mode("append").parquet(transcripts_dir)
