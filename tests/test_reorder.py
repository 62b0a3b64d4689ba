"""Event-time re-sequencer (operators/reorder.py): bounded-lateness
reordering across micro-batches — per-key output is totally ordered,
complete up to the watermark bound, and stragglers past the bound drop
(never emit out of order)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from hydra_spark.operators.reorder import reorder_events

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("seq_no", T.LongType(), False),
    ]
)

BASE = pd.Timestamp("2025-01-01 00:00:00")


def _mk_input(tmp_path):
    """5 keys x 60 events at 10 s spacing, sliced into files of 120 s
    with +-30 s jitter: events are OUT OF ORDER across files (bounded
    by 30 s < the 60 s watermark delay) and shuffled within each file.
    Plus one straggler in the last data file, 10 minutes older than the
    watermark by then — must be dropped."""
    rng = np.random.default_rng(23)
    rows = []
    for k in range(5):
        for i in range(60):
            t = i * 10 + int(rng.integers(0, 30))  # jittered arrival slot
            ts = BASE + pd.Timedelta(seconds=i * 10)
            rows.append((f"u{k}", ts, "e", k * 1000 + i, t // 120))
    files: dict[int, list] = {}
    for u, ts, lab, sq, f in rows:
        files.setdefault(f, []).append((u, ts, lab, sq))
    last = max(files)
    files[last].append(("u0", BASE - pd.Timedelta(seconds=600), "late", 99999))
    # two far-future sentinel files: round 1 advances the watermark past
    # every real event, round 2 runs the batch in which timeouts fire
    for r in (1, 2):
        files[last + r] = [
            ("u-sentinel", BASE + pd.Timedelta(hours=2 + r), "s", 10**6 + r)
        ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, f in enumerate(sorted(files)):
        rng.shuffle(files[f])  # within-batch arrival order is arbitrary
        pdf = pd.DataFrame(files[f], columns=["user_id", "ts", "label", "seq_no"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        path = os.path.join(src, f"file_{i:03d}.parquet")
        pdf.to_parquet(path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return src, rows


def test_reorder_total_order_completeness_and_late_drop(spark, tmp_path):
    src, rows = _mk_input(tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = reorder_events(stream, "user_id", "ts", watermark="60 seconds")
    got: list[tuple] = []
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, bid: got.extend(
                (bid, r.user_id, r.ts, r.seq_no) for r in bdf.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    real = [g for g in got if g[1].startswith("u") and g[1] != "u-sentinel"]
    # the past-the-bound straggler was dropped, everything else emitted
    assert all(g[3] != 99999 for g in real)
    assert len(real) == 300
    # per key: batch-order concatenation is EXACTLY the event-time order
    for k in range(5):
        u = f"u{k}"
        seq = [g for g in sorted(
            (g for g in real if g[1] == u), key=lambda g: g[0]
        )]
        # within one batch rows are sorted; across batches bid asc
        ts_seq = [g[2] for g in seq]
        assert ts_seq == sorted(ts_seq)
        assert [g[3] for g in seq] == sorted(g[3] for g in seq)
        assert len(seq) == 60


def test_reorder_rejects_batch_and_bad_types(spark):
    df = spark.createDataFrame([("a", BASE.to_pydatetime(), "x", 1)], SCHEMA)
    with pytest.raises(ValueError, match="streaming operator"):
        reorder_events(df, "user_id", "ts")
