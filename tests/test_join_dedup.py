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


def test_asof_join_semantics(spark):
    """Backward-inclusive as-of with tolerance + greatest-id tiebreak,
    verified against a brute-force per-row oracle."""
    import datetime as dt

    from hydra_spark.operators.join import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [("u1", 100, ts(10)), ("u1", 101, ts(40)), ("u2", 102, ts(5)),
         ("u3", 103, ts(10))],
        "user string, lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 1, ts(10)),  # equal-ts: counts for lid=100
            ("u1", 2, ts(10)),  # same ts: greater id wins the tiebreak
            ("u1", 3, ts(9)),
            ("u1", 4, ts(41)),  # after lid=101: never matches
            ("u2", 5, ts(-40)), # outside the 30-minute tolerance
        ],
        "user string, rid int, rts timestamp",
    )
    out = asof_join(
        left, right, on=["user"], left_ts="lts", right_ts="rts",
        tolerance="30 minutes", tiebreak="rid",
    )
    got = {r.lid: r.rid for r in out.collect()}
    # lid=100 -> rid 2 (equal ts, tiebreak over 1; 3 is older)
    # lid=101 -> rid 2 (latest <= 40 within 30 min)
    # lid=102 -> None (rid 5 outside tolerance); lid=103 -> None (no u3)
    assert got == {100: 2, 101: 2, 102: None, 103: None}
    inner = asof_join(
        left, right, on=["user"], left_ts="lts", right_ts="rts",
        tolerance="30 minutes", tiebreak="rid", how="inner",
    )
    assert {r.lid for r in inner.collect()} == {100, 101}


def test_asof_join_name_collision_and_no_tolerance(spark):
    import datetime as dt

    from hydra_spark.operators.join import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", 1, t0)], "key string, v int, lts timestamp"
    )
    right = spark.createDataFrame(
        [("k", 9, t0 - dt.timedelta(days=400))], "key string, v int, rts timestamp"
    )
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    row = out.collect()[0]
    # colliding right column suffixed; no tolerance -> arbitrarily old match
    assert row.v == 1 and row.v_asof == 9


def test_asof_join_null_timestamps(spark):
    """NULL-ts right rows never match; NULL-ts left rows stay unmatched
    (merge_asof / ASOF JOIN semantics), even without a tolerance."""
    import datetime as dt

    from hydra_spark.operators.join import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("u", 1, t0), ("u", 2, None)], "user string, lid int, lts timestamp"
    )
    right = spark.createDataFrame(
        [("u", 7, None)], "user string, rid int, rts timestamp"
    )
    got = {r.lid: r.rid for r in asof_join(
        left, right, on=["user"], left_ts="lts", right_ts="rts"
    ).collect()}
    assert got == {1: None, 2: None}
