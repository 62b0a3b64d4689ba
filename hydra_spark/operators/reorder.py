"""Event-time re-sequencer — the ordering layer in front of order-
sensitive stateful operators.

The CEP matchers (operators/cep.py) contract on per-key EVENT-TIME
order across micro-batches; per-key-partitioned sources give it for
free, but a source that interleaves time ranges across batches (e.g. a
backfill merging with live data) does not. This operator restores it:
per key, buffer arriving events in state and emit them in event-time
order once the watermark passes — bounded-lateness reordering, the
Flink "watermark + sorted buffer" pattern built on
``applyInPandasWithState``.

Correctness frame: at each micro-batch, everything buffered with
ts <= watermark is emitted sorted; everything newer waits. Because the
watermark only advances, every later emission carries ts strictly
greater than anything already emitted — per-key output order is total.
Events arriving with ts <= the current watermark (true stragglers past
the bound) are DROPPED, not emitted out of order: the same
late-data contract as every watermarked aggregation in the engine.
State for idle keys flushes via event-time timeout (set just past the
newest buffered ts), so tails drain without new traffic on the key.

Scale posture: state per key is the events inside one watermark delay
— the minimum any reordering operator can hold; no shuffle beyond the
groupBy(key) every per-key stateful operator pays. At 10^12 events the
delay bound is the knob: it trades reorder tolerance against state
size, exactly like a join's watermark trades tolerance against state.

Hydra analog: the ingest protocol's per-request sequencing
(IngestionSupervisor collecting out-of-order ingestor replies into one
ordered lifecycle report) — here generalized to data-plane events.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# payload column types the state schema can carry (arrays in state)
_SUPPORTED = (T.StringType, T.LongType, T.IntegerType, T.DoubleType)


def reorder_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    watermark: str = "120 seconds",
) -> DataFrame:
    """Streaming only: per-key bounded-lateness event-time re-sequencer.

    Output schema == input schema; rows are emitted per key in strictly
    non-decreasing event time (ties broken by the remaining columns for
    determinism). Rows later than the watermark bound are dropped.
    """
    if not df.isStreaming:
        raise ValueError("reorder_events is a streaming operator")
    fields = df.schema.fields
    payload = [f for f in fields if f.name not in (key_col, ts_col)]
    for f in payload:
        if not isinstance(f.dataType, _SUPPORTED):
            raise ValueError(
                f"reorder_events payload column {f.name!r} has unsupported "
                f"type {f.dataType} (supported: string/int/long/double)"
            )
    out_schema = T.StructType(fields)  # identical shape, original order
    state_schema = T.StructType(
        [T.StructField("ts_us", T.ArrayType(T.LongType()))]
        + [T.StructField(f.name, T.ArrayType(f.dataType)) for f in payload]
    )
    pnames = [f.name for f in payload]

    def _emit(key, ts_us: list, cols: dict, upto_us: int):
        """Rows with ts <= upto_us, sorted by (ts, *payload); returns
        (emitted DataFrame or None, kept ts list, kept col lists)."""
        rows = sorted(
            zip(ts_us, *(cols[p] for p in pnames)),
            key=lambda r: (r[0],) + tuple(str(v) for v in r[1:]),
        )
        out = [r for r in rows if r[0] <= upto_us]
        kept = [r for r in rows if r[0] > upto_us]
        emitted = None
        if out:
            by_name = {
                key_col: [key[0]] * len(out),
                ts_col: [pd.Timestamp(r[0], unit="us") for r in out],
                **{p: [r[i + 1] for r in out] for i, p in enumerate(pnames)},
            }
            # input column order preserved (output schema == input schema)
            emitted = pd.DataFrame({f.name: by_name[f.name] for f in fields})
        return emitted, [r[0] for r in kept], {
            p: [r[i + 1] for r in kept] for i, p in enumerate(pnames)
        }

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            ts_us = list(stored[0])
            cols = {p: list(stored[i + 1]) for i, p in enumerate(pnames)}
        else:
            ts_us, cols = [], {p: [] for p in pnames}
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            # watermark passed the newest buffered event: drain fully
            emitted, ts_us, cols = _emit(key, ts_us, cols, max(ts_us) if ts_us else 0)
            state.remove()
            if emitted is not None:
                yield emitted
            return
        for pdf in pdfs:
            # column-wise extraction (itertuples mangles underscore-led
            # names; to_dict is per-row overhead we don't need)
            tvals = pdf[ts_col].tolist()
            pvals = {p: pdf[p].tolist() for p in pnames}
            for i, tv in enumerate(tvals):
                t = int(pd.Timestamp(tv).value // 1000)
                if t <= wm_us:
                    continue  # past the bound: dropped, never reordered
                ts_us.append(t)
                for p in pnames:
                    cols[p].append(pvals[p][i])
        emitted, ts_us, cols = _emit(key, ts_us, cols, wm_us)
        if ts_us:
            state.update((ts_us, *(cols[p] for p in pnames)))
            horizon_ms = max(ts_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if emitted is not None:
            yield emitted

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
