"""Dynamic broadcast routing (operators/enrich.py): join/ignore against
a live registry table, and the R1 contract that matters — a registry
MERGE committed mid-stream re-routes the NEXT micro-batch without a
stream restart (Hydra: dynamic ingestor registration,
IngestionSupervisor.scala:47-59)."""

import datetime as dt
import os

from pyspark.sql import functions as F

from hydra_spark.operators.enrich import route_with_registry, start_routed_stream
from hydra_spark.synth import CLIPS_SCHEMA
from hydra_spark.tables import TransactionalTable


def _clips_df(spark, ids_codecs):
    ts = dt.datetime(2024, 1, 1)
    rows = [
        (cid, b"\x00\x01", 8000, 100, codec, None, 0, i, ts)
        for i, (cid, codec) in enumerate(ids_codecs)
    ]
    return spark.createDataFrame(rows, schema=CLIPS_SCHEMA)


def _mk_registry(spark, path, rows, label):
    reg = TransactionalTable(str(path), ["codec"], n_buckets=1)
    reg.append_dedup(
        spark,
        spark.createDataFrame(rows, "codec string, route string, enabled boolean"),
        label,
    )
    return reg


def test_route_batch_join_ignore(spark, tmp_path):
    reg = _mk_registry(
        spark,
        tmp_path / "reg",
        [("pcm16", "pcm-pipe", True), ("alaw", "g711-pipe", False)],
        "v1",
    )
    df = _clips_df(
        spark, [("a", "pcm16"), ("b", "alaw"), ("c", "opus"), ("d", "pcm16")]
    )
    got = {r.clip_id: r.route for r in route_with_registry(df, spark, reg).collect()}
    # enabled -> its route; disabled AND unknown both -> ignore
    assert got == {"a": "pcm-pipe", "b": "ignore", "c": "ignore", "d": "pcm-pipe"}
    # a half-written registry row (enabled but NULL route) must park
    # records under 'ignore', never a NULL route group
    reg.merge_upsert(
        spark,
        spark.createDataFrame(
            [("opus", None, True)], "codec string, route string, enabled boolean"
        ),
        "half-written",
    )
    got2 = {r.clip_id: r.route for r in route_with_registry(df, spark, reg).collect()}
    assert got2["c"] == "ignore"


def test_registry_merge_reroutes_next_batch_without_restart(spark, tmp_path):
    """File 1 processes under routes-v1 (alaw disabled); a MERGE enables
    alaw; file 2 — same codecs, new clip ids — must route alaw to
    g711-pipe in the SAME run of the SAME query."""
    audio_dir = str(tmp_path / "audio")
    os.makedirs(audio_dir)
    reg = _mk_registry(
        spark,
        tmp_path / "reg",
        [("pcm16", "pcm-pipe", True), ("alaw", "g711-pipe", False)],
        "v1",
    )
    _clips_df(spark, [("a1", "pcm16"), ("a2", "alaw")]).coalesce(1).write.mode(
        "append"
    ).parquet(audio_dir)
    q, out = start_routed_stream(
        spark, audio_dir, reg, str(tmp_path / "out"), files_per_trigger=4
    )
    try:
        q.processAllAvailable()
        first = {r.clip_id: r.route for r in out.read(spark).collect()}
        assert first == {"a1": "pcm-pipe", "a2": "ignore"}
        # commit the registry flip, then ship more files — the running
        # query must pick up the new snapshot at the next trigger
        reg.merge_upsert(
            spark,
            spark.createDataFrame(
                [("alaw", "g711-pipe", True)],
                "codec string, route string, enabled boolean",
            ),
            "v2-enable-alaw",
        )
        _clips_df(spark, [("b1", "pcm16"), ("b2", "alaw")]).coalesce(1).write.mode(
            "append"
        ).parquet(audio_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.clip_id: r.route for r in out.read(spark).collect()}
    assert got == {
        "a1": "pcm-pipe",
        "a2": "ignore",  # routed under v1, append_dedup keeps history
        "b1": "pcm-pipe",
        "b2": "g711-pipe",  # same codec, post-MERGE batch -> joined
    }
