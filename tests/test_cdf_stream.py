"""Streaming CDF source (hydra_cdf): version-cursor offsets over a
TransactionalTable's manifest chain, per-changed-bucket partitions,
parity with the batch read_changes, and cursor resume."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hydra_spark.sources.cdf_stream import stream_changes
from hydra_spark.tables import TransactionalTable


def _kv(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"k": [r[0] for r in rows], "v": [r[1] for r in rows]})
    )


def _collect_stream(spark, path, starting_version, out):
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r.k, r.v, r._change_type) for r in batch_df.collect()
        )

    q = (
        stream_changes(spark, path, starting_version=starting_version)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", out)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return got


def test_stream_matches_batch_read_changes(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge_upsert(spark, _kv(spark, [("a", 1), ("b", 2), ("c", 3)]), 0)
    v1 = t.manifest()["version"]
    t.merge_upsert(spark, _kv(spark, [("b", 20), ("d", 4)]), 1)
    t.merge_upsert(
        spark,
        _kv(spark, [("c", 3)]).withColumn("_delete", F.lit(True)),
        2,
    )
    got = _collect_stream(spark, str(tmp_path / "t"), v1, str(tmp_path / "cp"))
    want = {
        (r.k, r.v, r._change_type)
        for r in t.read_changes(spark, v1).collect()
    }
    assert set(got) == want
    assert ("b", 20, "update") in want and ("d", 4, "insert") in want
    assert ("c", 3, "delete") in want  # pre-image on delete


def test_stream_resumes_from_checkpoint_cursor(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge_upsert(spark, _kv(spark, [("a", 1)]), 0)
    v1 = t.manifest()["version"]
    t.merge_upsert(spark, _kv(spark, [("b", 2)]), 1)
    cp = str(tmp_path / "cp")
    first = _collect_stream(spark, str(tmp_path / "t"), v1, cp)
    assert set(first) == {("b", 2, "insert")}
    # new commits while the stream is down; restart on the SAME
    # checkpoint -> only the new range replays (cursor resumed, not
    # startingVersion)
    t.merge_upsert(spark, _kv(spark, [("a", 10), ("c", 3)]), 2)
    second = _collect_stream(spark, str(tmp_path / "t"), v1, cp)
    assert set(second) == {("a", 10, "update"), ("c", 3, "insert")}


def test_stream_default_start_is_future_only(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge_upsert(spark, _kv(spark, [("a", 1)]), 0)
    got = _collect_stream(spark, str(tmp_path / "t"), None, str(tmp_path / "cp"))
    assert got == []  # nothing happened after stream start


def test_metadata_only_commit_yields_empty_batch(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge_upsert(spark, _kv(spark, [("a", 1)]), 0)
    v1 = t.manifest()["version"]
    t.set_properties({"owner": "me"})  # version bump, zero file changes
    got = _collect_stream(spark, str(tmp_path / "t"), v1, str(tmp_path / "cp"))
    assert got == []


def test_bucket_pruned_partitions(spark, tmp_path):
    """Only buckets whose file lists changed become input partitions."""
    from hydra_spark.sources.cdf_stream import CdfStreamReader

    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=8)
    t.merge_upsert(spark, _kv(spark, [(f"k{i}", i) for i in range(40)]), 0)
    v1 = t.manifest()["version"]
    t.merge_upsert(spark, _kv(spark, [("k0", 100)]), 1)
    v2 = t.manifest()["version"]
    r = CdfStreamReader({"path": str(tmp_path / "t")})
    parts = r.partitions({"version": v1}, {"version": v2})
    touched = [p for p in parts if p.files_old or p.files_new]
    assert len(touched) == 1  # k0's bucket only


def test_array_typed_value_columns(spark, tmp_path):
    """Nested (array) value columns diff correctly: pyarrow hands them
    back as numpy arrays, where a bare == is elementwise — update
    detection and row emission must stay null-safe and value-exact."""
    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)

    def df(rows):
        return spark.createDataFrame(rows, "k string, emb array<float>")

    t.merge_upsert(spark, df([("a", [1.0, 2.0]), ("b", [3.0, 4.0]), ("c", None)]), 0)
    v1 = t.manifest()["version"]
    # a changes, b rewritten identical (no row), c stays null (no row),
    # d inserted with a null array
    t.merge_upsert(
        spark,
        df([("a", [1.0, 9.0]), ("b", [3.0, 4.0]), ("c", None), ("d", None)]),
        1,
    )
    got = []

    def sink(batch_df, batch_id):
        got.extend(
            (r.k, list(r.emb) if r.emb is not None else None, r._change_type)
            for r in batch_df.collect()
        )

    q = (
        stream_changes(spark, str(tmp_path / "t"), starting_version=v1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert set((k, tuple(e) if e else None, c) for k, e, c in got) == {
        ("a", (1.0, 9.0), "update"),
        ("d", None, "insert"),
    }


def test_expired_cursor_raises(spark, tmp_path):
    """Resuming past an expired snapshot fails LOUDLY (wrapped by Spark
    in StreamingQueryException) instead of silently skipping changes."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = TransactionalTable(str(tmp_path / "t"), ["k"], n_buckets=4)
    for i in range(6):
        t.merge_upsert(spark, _kv(spark, [(f"k{i}", i)]), i)
    t.expire_snapshots(keep_last=2)
    with pytest.raises(StreamingQueryException, match="expired or missing"):
        _collect_stream(spark, str(tmp_path / "t"), 1, str(tmp_path / "cp"))
