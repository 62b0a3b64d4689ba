"""Interval join + dedup semantics (batch parity; streaming in e2e test)."""

import pandas as pd
from pyspark.sql import functions as F

from hydra_spark.operators.join import clip_transcript_join, dedup_within_watermark
from hydra_spark.operators.state import latest_wins_batch


def test_batch_interval_join_vs_oracle(spark, dataset):
    aud = spark.read.parquet(dataset["audio"]).select("clip_id", "event_time")
    trs = spark.read.parquet(dataset["transcripts"])
    out = clip_transcript_join(aud, trs, how="left_outer").toPandas()
    a = aud.toPandas().set_index("clip_id")
    t = trs.toPandas().set_index("clip_id")
    # oracle: matched iff transcript exists and delay in [-10s, +60s]
    assert len(out) == len(a)
    matched = out[out.transcript.notna()]
    for _, r in matched.head(300).iterrows():
        delay = (r.transcript_time - r.event_time).total_seconds()
        assert -10.0 <= delay <= 60.0
    exp_matched = 0
    for cid, row in a.iterrows():
        if cid in t.index:
            delay = (t.loc[cid, "event_time"] - row.event_time).total_seconds()
            if -10.0 <= delay <= 60.0:
                exp_matched += 1
    assert len(matched) == exp_matched


def test_dedup_within_watermark_batch(spark, clips):
    doubled = clips.union(clips)
    out = dedup_within_watermark(doubled, ["clip_id"])
    assert out.count() == clips.count()


def test_latest_wins_batch_tombstones(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "c"],
            "event_time": pd.to_datetime(
                ["2025-01-01 00:00:01", "2025-01-01 00:00:05", "2025-01-01 00:00:02",
                 "2025-01-01 00:00:09", "2025-01-01 00:00:03"]
            ),
            "v": ["a1", "a2", "b1", None, "c1"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = latest_wins_batch(df, ["k"], ts_col="event_time", value_col="v").toPandas()
    got = dict(zip(out.k, out.v))
    # a -> latest a2; b -> latest is tombstone (dropped); c -> c1
    assert got == {"a": "a2", "c": "c1"}
