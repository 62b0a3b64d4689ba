"""CEP pattern detection — ordered event-sequence matching per key.

The north-star frames this engine as a Structured Streaming *CEP*
engine; windows/joins/latest-wins cover the aggregation side, this
operator covers pattern matching proper: detect an ordered sequence of
event labels per key completing within a time budget (e.g. two clicks
then a purchase inside 30 minutes; N decode failures inside a minute).

Two forms sharing one contract:
  * ``sequence_matches_batch`` — lead() window functions, pure
    declarative (Catalyst: one shuffle on the key, whole-stage codegen);
    this is also the DuckDB-oracle-checkable form.
  * ``sequence_matches_stream`` — ``applyInPandasWithState``: per-key
    state holds the last ``len(pattern)-1`` (ts, label) events; each
    arriving event either extends or restarts partial matches. Events
    are processed in event-time order within each micro-batch; matches
    are emitted exactly when the final label arrives.

Hydra has no CEP (SURVEY.md §2.8) — this is north-rule surface built
directly on Spark primitives.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sequence_matches_batch(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    pattern: list[str],
    within_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """All per-key occurrences of `pattern` over consecutive events
    (event-time order; ties broken by ``tiebreak_col`` if given, else
    the label) completing within `within_seconds`.

    Output: (key, seq_start, seq_end) — one row per match, where the
    match is over CONSECUTIVE events of that key.
    """
    n = len(pattern)
    order = [F.col(ts_col), F.col(tiebreak_col or label_col)]
    w = W.partitionBy(key_col).orderBy(*order)
    out = df
    cond = F.lit(True)
    for i, lab in enumerate(pattern):
        cond = cond & (F.lead(label_col, i).over(w) == lab)
    end_ts = F.lead(ts_col, n - 1).over(w)
    cond = cond & (
        end_ts <= F.col(ts_col) + F.make_dt_interval(secs=F.lit(float(within_seconds)))
    )
    return (
        out.withColumn("_m", cond)
        .withColumn("_end", end_ts)
        .where(F.col("_m"))
        .select(
            F.col(key_col),
            F.col(ts_col).alias("seq_start"),
            F.col("_end").alias("seq_end"),
        )
    )


def sequence_matches_stream(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    pattern: list[str],
    within_seconds: int,
    watermark: str = "60 seconds",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming form: per-key rolling buffer of the trailing
    ``len(pattern)`` events; emits a match when a buffer suffix equals
    the pattern within the time budget. Assumes per-key event-time order
    across batches (guaranteed by per-key-partitioned sources; within a
    batch we sort by (ts, tiebreak) — the same order as the batch form).

    Timestamps compare at MICROsecond precision (the batch form's
    native timestamp precision, so streaming == batch exactly at the
    budget boundary). Idle keys expire via event-time timeout once the
    watermark passes last_event + budget: any later match spanning the
    expired buffer would exceed the budget anyway, so expiry never
    changes results — it just bounds state at 10^12-key cardinality.
    """
    n = len(pattern)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("seq_start", T.TimestampType()),
            T.StructField("seq_end", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("labels", T.ArrayType(T.StringType())),
        ]
    )
    budget_us = within_seconds * 1_000_000
    is_streaming = df.isStreaming  # captured as a plain bool (fn ships to workers)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ts_buf, lab_buf = state.get if state.exists else ([], [])
        ts_buf, lab_buf = list(ts_buf), list(lab_buf)
        matches = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tiebreak_col or label_col])
            for ts, lab in zip(pdf[ts_col], pdf[label_col]):
                ts_us = int(ts.value // 1000)
                ts_buf.append(ts_us)
                lab_buf.append(str(lab))
                if len(ts_buf) > n:
                    ts_buf, lab_buf = ts_buf[-n:], lab_buf[-n:]
                if (
                    len(lab_buf) == n
                    and lab_buf == pattern
                    and ts_buf[-1] - ts_buf[0] <= budget_us
                ):
                    matches.append((ts_buf[0], ts_buf[-1]))
        state.update((ts_buf, lab_buf))
        if ts_buf and is_streaming:
            # expire once no in-budget continuation can exist
            timeout_ms = ts_buf[-1] // 1000 + within_seconds * 1000 + 1
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if matches:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(matches),
                    "seq_start": [pd.Timestamp(a, unit="us") for a, _ in matches],
                    "seq_end": [pd.Timestamp(b, unit="us") for _, b in matches],
                }
            )

    if is_streaming:
        g = df.withWatermark(ts_col, watermark).groupBy(key_col)
        return g.applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def kleene_matches_ref(
    events: list[tuple[int, str]], a: str, b: str, c: str, budget_us: int
) -> list[tuple[int, int, int]]:
    """Reference matcher for the quantified pattern ``a b* c`` over one
    key's (ts_us, label) events in order — THE semantics contract the
    streaming operator below must reproduce across micro-batch
    boundaries (pytest runs this on the full event list and compares):

      * a match spans CONSECUTIVE events: start at an ``a``, absorb any
        number of ``b``, complete on a ``c``, all within ``budget_us``
        (MATCH_RECOGNIZE's default strict contiguity)
      * any label that is neither ``b`` nor ``c`` kills the open
        candidate; an ``a`` kills-then-reopens (so under strict
        contiguity at most ONE candidate is ever open — the list form
        below is kept for the general multi-pattern extension)
      * a completing ``c`` emits the in-budget candidate and consumes
        it

    Returns [(seq_start_us, seq_end_us, n_absorbed)] in emission order.
    """
    cands: list[tuple[int, int]] = []  # (start_us, n_b)
    out: list[tuple[int, int, int]] = []
    for ts, lab in events:
        if lab == c:
            out.extend(
                (s, ts, nb) for s, nb in cands if ts - s <= budget_us
            )
            cands = []
        elif lab == b:
            cands = [(s, nb + 1) for s, nb in cands]
        else:
            cands = []
        if lab == a:
            cands.append((ts, 0))
        cands = [(s, nb) for s, nb in cands if ts - s <= budget_us]
    return out


def kleene_matches_stream(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    a: str,
    b: str,
    c: str,
    within_seconds: int,
    watermark: str = "60 seconds",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming Kleene-star CEP: quantified pattern ``a b* c`` per key
    (the MATCH_RECOGNIZE shape `cep_pattern_scan` runs declaratively in
    batch), matched incrementally with ``applyInPandasWithState``.
    State per key is the open-candidate list — (start_ts, absorbed
    count) of the un-completed ``a`` run — pruned to the time budget;
    under strict contiguity the list holds at most one entry, so state
    is O(1) per key (tighter than the fixed-sequence detector's
    trailing buffer). Candidates survive
    micro-batch boundaries; matches emit the moment their ``c``
    arrives. Idle keys expire once the watermark passes the newest
    candidate's completion horizon (start + budget): expiry can only
    drop candidates that could no longer complete in budget, so it
    never changes results.

    Semantics contract: ``kleene_matches_ref`` — UNDER THE SAME
    in-order assumption as ``sequence_matches_stream``: per-key
    event-time order ACROSS micro-batches (guaranteed by
    per-key-partitioned sources; within a batch we sort by
    (ts, tiebreak)). An event arriving in a later batch with an
    earlier timestamp is processed after its successors and can
    produce matches the reference (run on the fully ordered list)
    would not — order-tolerant matching needs a buffering layer in
    front, not silent reordering here.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("seq_start", T.TimestampType()),
            T.StructField("seq_end", T.TimestampType()),
            T.StructField("n_absorbed", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("starts_us", T.ArrayType(T.LongType())),
            T.StructField("n_bs", T.ArrayType(T.LongType())),
        ]
    )
    budget_us = within_seconds * 1_000_000
    is_streaming = df.isStreaming

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        starts, n_bs = state.get if state.exists else ([], [])
        cands = list(zip(starts, n_bs))
        matches = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tiebreak_col or label_col])
            for ts, lab in zip(pdf[ts_col], pdf[label_col]):
                ts_us = int(ts.value // 1000)
                lab = str(lab)
                if lab == c:
                    matches.extend(
                        (s, ts_us, nb) for s, nb in cands if ts_us - s <= budget_us
                    )
                    cands = []
                elif lab == b:
                    cands = [(s, nb + 1) for s, nb in cands]
                else:
                    cands = []
                if lab == a:
                    cands.append((ts_us, 0))
                cands = [(s, nb) for s, nb in cands if ts_us - s <= budget_us]
        if cands:
            state.update(([s for s, _ in cands], [nb for _, nb in cands]))
            if is_streaming:
                horizon_ms = max(s for s, _ in cands) // 1000 + within_seconds * 1000 + 1
                state.setTimeoutTimestamp(
                    max(horizon_ms, state.getCurrentWatermarkMs() + 1)
                )
        elif state.exists:
            state.remove()
        if matches:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(matches),
                    "seq_start": [pd.Timestamp(s, unit="us") for s, _, _ in matches],
                    "seq_end": [pd.Timestamp(e, unit="us") for _, e, _ in matches],
                    "n_absorbed": [int(nb) for _, _, nb in matches],
                }
            )

    if is_streaming:
        g = df.withWatermark(ts_col, watermark).groupBy(key_col)
        return g.applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
