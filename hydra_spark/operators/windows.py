"""Event-time windowing — tumbling / sliding / session + watermark policy.

Hydra has no windowing (verified in SURVEY.md §2.8); the north rule adds
it. These are thin, opinionated wrappers over Spark's native window /
session_window + watermark so every pipeline uses one watermark policy
and aliased, stable output columns (window_start/window_end), which the
exactly-once sink keys on.

The same functions run in batch AND streaming — ``F.window`` is
mode-agnostic, so the batch oracle checks and the streaming engine share
the plan shape. Aggregations are declarative, so Catalyst gives partial
(map-side) aggregation before the shuffle for free — at 10^12 rows the
shuffle moves one partial row per (task, window, key), not one row per
clip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_watermark(df: DataFrame, event_col: str = "event_time", delay: str = "60 seconds") -> DataFrame:
    if df.isStreaming:
        return df.withWatermark(event_col, delay)
    return df  # batch: watermark is a no-op


def _flatten(df: DataFrame, win_col: str = "window") -> DataFrame:
    return df.withColumn("window_start", F.col(f"{win_col}.start")).withColumn(
        "window_end", F.col(f"{win_col}.end")
    ).drop(win_col)


def tumbling(
    df: DataFrame,
    size: str,
    *keys: str,
    aggs: list[Column] | None = None,
    event_col: str = "event_time",
    watermark: str = "60 seconds",
) -> DataFrame:
    aggs = aggs or [F.count("*").alias("n")]
    g = with_watermark(df, event_col, watermark).groupBy(F.window(event_col, size), *keys)
    return _flatten(g.agg(*aggs))


def sliding(
    df: DataFrame,
    size: str,
    slide: str,
    *keys: str,
    aggs: list[Column] | None = None,
    event_col: str = "event_time",
    watermark: str = "60 seconds",
) -> DataFrame:
    aggs = aggs or [F.count("*").alias("n")]
    g = with_watermark(df, event_col, watermark).groupBy(F.window(event_col, size, slide), *keys)
    return _flatten(g.agg(*aggs))


def session(
    df: DataFrame,
    gap: str | Column,
    *keys: str,
    aggs: list[Column] | None = None,
    event_col: str = "event_time",
    watermark: str = "60 seconds",
) -> DataFrame:
    """``gap`` is a fixed interval string, or a Column evaluating to an
    interval string PER EVENT (dynamic gap): each event spans
    [ts, ts+gap), overlapping spans merge, session end = max reach of
    its members — Spark's native dynamic session_window semantics."""
    aggs = aggs or [F.count("*").alias("n")]
    g = with_watermark(df, event_col, watermark).groupBy(F.session_window(event_col, gap), *keys)
    return _flatten(g.agg(*aggs), "session_window")


def clip_window_aggs() -> list[Column]:
    """The flagship per-(window, codec) aggregate set."""
    return [
        F.count("*").alias("n_clips"),
        F.sum("n_samples").alias("total_samples"),
        F.avg("rms_db").alias("avg_rms_db"),
        F.max("peak").alias("max_peak"),
        F.sum(F.when(F.col("transcript").isNotNull(), 1).otherwise(0)).alias("n_with_transcript"),
    ]
