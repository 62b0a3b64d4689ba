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


def test_dynamic_gap_session_merge_and_stream_parity(spark, tmp_path):
    """Dynamic-gap sessions: a long-gap event keeps the session open
    across a silence a short-gap rule would split (and vice versa);
    the streaming form (watermarked, file replay) must equal batch."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    base = datetime(2025, 1, 1)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("typ", T.StringType()),
            T.StructField("event_time", T.TimestampType()),
        ]
    )
    rows = [
        # long(60s)-gap event, then 50s silence: still ONE session; the
        # following short(10s)-gap event 50s later splits
        (1, "long", base),
        (1, "short", base + timedelta(seconds=50)),
        (1, "short", base + timedelta(seconds=100)),   # > 50+10 -> new
        # key 2: short gaps chain within 10s
        (2, "short", base + timedelta(seconds=1)),
        (2, "short", base + timedelta(seconds=9)),
        (2, "short", base + timedelta(seconds=30)),    # new session
    ]
    gap = F.when(F.col("typ") == "long", F.lit("60 seconds")).otherwise(
        F.lit("10 seconds")
    )

    def build(df):
        return win.session(
            df, gap, "k", aggs=[F.count("*").alias("n")], event_col="event_time",
            watermark="10 minutes",
        ).select("k", "window_start", "window_end", "n")

    batch = build(spark.createDataFrame(rows, schema)).collect()
    got = {(r.k, r.window_start): (r.n, r.window_end) for r in batch}
    assert got[(1, base)] == (2, base + timedelta(seconds=60))  # merged
    assert got[(1, base + timedelta(seconds=100))][0] == 1
    assert got[(2, base + timedelta(seconds=1))][0] == 2
    assert len(got) == 4

    d = str(tmp_path / "src")
    for r in rows:  # one file per event: many micro-batches
        spark.createDataFrame([r], schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(9, "short", base + timedelta(days=1))], schema
    ).coalesce(1).write.mode("append").parquet(d)
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(d)
    )
    out = []
    q = (
        build(src).writeStream
        .foreachBatch(lambda bdf, bid: out.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    stream_got = {
        (r.k, r.window_start): (r.n, r.window_end) for r in out if r.k != 9
    }
    assert stream_got == got
