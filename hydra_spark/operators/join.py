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

from pyspark.sql import DataFrame, functions as F


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
