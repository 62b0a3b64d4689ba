"""Stream-stream interval join: clips ⋈ late transcripts; watermarked dedup.

North-rule operator (SURVEY.md §2.8): pair each audio clip with its
(possibly late) transcript within a tolerance interval
[event_time - lo, event_time + hi]. In streaming both sides carry
watermarks and Spark bounds the join state (RocksDB-backed, see
session.py); transcripts later than the watermark are dropped — the
Hydra analog of the ingest timeout marking stragglers IngestorTimeout
(reference: ingest/src/main/scala/hydra.ingest/services/
IngestionSupervisor.scala:98-120).

The equality key (clip_id) plus the time-range predicate is what lets
Spark prune state per key per window; without the range bound the state
store would grow without limit at 10^12-clip scale.

Dedup: ``dropDuplicates`` within the watermark — Hydra's latest-wins
compacted-cache semantics (ConsumerGroupsAlgebra.scala:254-303).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def clip_transcript_join(
    clips: DataFrame,
    transcripts: DataFrame,
    lo: str = "10 seconds",
    hi: str = "60 seconds",
    how: str = "left_outer",
    clip_watermark: str = "60 seconds",
    transcript_watermark: str = "60 seconds",
) -> DataFrame:
    """clips(clip_id, ..., event_time) ⋈ transcripts(clip_id, transcript,
    event_time) with t.event_time ∈ [c.event_time - lo, c.event_time + hi].

    Key/value consistency (Hydra IngestionFlowV2.scala:120-141 — fields
    shared by key and value schemas must agree) is structural here: the
    equi-join on clip_id IS the consistency constraint.
    """
    c = clips
    t = transcripts.select(
        F.col("clip_id").alias("t_clip_id"),
        F.col("transcript").alias("t_transcript"),
        F.col("event_time").alias("t_event_time"),
    )
    if c.isStreaming:
        c = c.withWatermark("event_time", clip_watermark)
    if t.isStreaming:
        t = t.withWatermark("t_event_time", transcript_watermark)
    cond = (
        (c["clip_id"] == t["t_clip_id"])
        & (t["t_event_time"] >= F.expr(f"event_time - interval {lo}"))
        & (t["t_event_time"] <= F.expr(f"event_time + interval {hi}"))
    )
    joined = c.join(t, cond, how)
    # full_outer emits transcript-orphan rows whose c-side is all-NULL;
    # the key must survive from whichever side is present (no-op for
    # inner/left_outer, where c's key is always populated)
    joined = joined.withColumn("clip_id", F.coalesce(c["clip_id"], t["t_clip_id"]))
    return joined.drop("t_clip_id").withColumnRenamed("t_transcript", "transcript").withColumnRenamed(
        "t_event_time", "transcript_time"
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], event_col: str = "event_time", watermark: str = "60 seconds"
) -> DataFrame:
    """Exactly-once ingest dedup (Hydra A1 latest-wins / idempotent
    keyed publish). In streaming, state is bounded by the watermark via
    dropDuplicatesWithinWatermark; in batch it reduces to dropDuplicates."""
    if df.isStreaming:
        return df.withWatermark(event_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join: each left row matches the LATEST right row with the
    same key and right_ts <= left_ts (optionally within ``tolerance``,
    e.g. "30 minutes"). The nearest-earlier-match operator every
    event/feature pipeline needs (pandas merge_asof / DuckDB ASOF JOIN)
    that Spark has no built-in for.

    Spark-first shape — NOT a join at all: both sides are tagged and
    unioned, then one window pass per key ordered by (ts, side,
    tiebreak) carries the last-seen right payload forward
    (``last(ignorenulls)`` over unbounded-preceding). Cost = ONE
    shuffle on the key + a sort within partitions — the same price as
    the sort-merge join Spark would run for an equi-join, with no
    range-condition state blowup and no per-row Python. Equal
    timestamps: the right row counts (backward-inclusive); among
    equal-ts right rows the greatest ``tiebreak`` wins (deterministic).

    Output: every left column, plus the matched right row's non-key
    columns (NULL when unmatched; ``how='inner'`` drops unmatched).
    Right non-key columns colliding with left names get an ``_asof``
    suffix.
    """
    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    if not rpay:
        raise ValueError("right side needs at least one non-key column")
    rnames = {c: (c + "_asof" if c in left.columns else c) for c in rpay}
    l_struct = F.struct(*[F.col(c) for c in lpay]).alias("_l")
    r_struct = F.struct(
        *[F.col(c).alias(rnames[c]) for c in rpay],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    ).alias("_r")
    l_t = left.select(*on, l_struct)
    r_t = right.select(*on, r_struct)
    # NULL literal of the opposite side's struct type keeps the union
    # schema exact (unionByName with allowMissing would type it void)
    l_type = l_t.schema["_l"].dataType
    r_type = r_t.schema["_r"].dataType
    u = l_t.select(
        *on,
        F.col("_l")[left_ts].cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        "_l",
        F.lit(None).cast(r_type).alias("_r"),
    ).unionByName(
        # a right row with a NULL timestamp never matches anything
        # (merge_asof / ASOF JOIN semantics) — dropped here; otherwise
        # NULLS FIRST ordering would make it an earlier-than-everything
        # match. NULL-ts LEFT rows sort first for the same reason and so
        # correctly see no preceding right row (unmatched, kept on left).
        r_t.where(F.col("_r")["_rts"].isNotNull()).select(
            *on,
            F.col("_r")["_rts"].alias("_t"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(l_type).alias("_l"),
            "_r",
        )
    )
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col("_r")[rnames.get(tiebreak, tiebreak)].asc_nulls_first())
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance is not None:
        in_tol = F.col("_m")["_rts"] >= F.col("_t") - F.expr(f"interval {tolerance}")
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")).otherwise(F.lit(None).cast(r_type))
        )
    if how == "inner":
        matched = matched.where(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how}")
    return matched.select(
        *on,
        *[F.col("_l")[c].alias(c) for c in lpay],
        *[F.col("_m")[rnames[c]].alias(rnames[c]) for c in rpay],
    )
