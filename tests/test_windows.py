"""Window aggregation semantics vs a single-threaded pandas oracle."""

import pandas as pd
from pyspark.sql import functions as F

from hydra_spark.operators import windows as win


def test_tumbling_vs_oracle(spark, clips):
    out = win.tumbling(
        clips, "10 seconds", "codec", aggs=[F.count("*").alias("n")], event_col="event_time"
    ).toPandas()
    pdf = clips.select("codec", "event_time").toPandas()
    pdf["ws"] = pdf.event_time.dt.floor("10s")
    oracle = pdf.groupby(["ws", "codec"]).size().reset_index(name="n")
    merged = out.merge(oracle, left_on=["window_start", "codec"], right_on=["ws", "codec"], how="outer")
    assert len(merged) == len(oracle) == len(out)
    assert (merged.n_x == merged.n_y).all()


def test_sliding_each_event_in_two_windows(spark, clips):
    out = win.sliding(
        clips, "10 seconds", "5 seconds", aggs=[F.count("*").alias("n")], event_col="event_time"
    ).toPandas()
    assert out.n.sum() == clips.count() * 2


def test_session_vs_oracle(spark, clips):
    """Session windows per ingest_partition with a 5s gap."""
    out = win.session(
        clips, "5 seconds", "ingest_partition", aggs=[F.count("*").alias("n")], event_col="event_time"
    ).toPandas()
    pdf = clips.select("ingest_partition", "event_time").toPandas().sort_values(
        ["ingest_partition", "event_time"]
    )
    sessions = []
    for p, grp in pdf.groupby("ingest_partition"):
        start = prev = None
        n = 0
        for t in grp.event_time:
            if prev is not None and (t - prev).total_seconds() >= 5.0:
                sessions.append((p, start, n))
                start, n = t, 0
            if start is None:
                start = t
            n += 1
            prev = t
        if start is not None:
            sessions.append((p, start, n))
    oracle = pd.DataFrame(sessions, columns=["ingest_partition", "window_start", "n"])
    a = out.sort_values(["ingest_partition", "window_start"]).reset_index(drop=True)
    b = oracle.sort_values(["ingest_partition", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.n.values == b.n.values).all()
    assert (a.window_start.values == b.window_start.values).all()
