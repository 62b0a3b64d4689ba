"""Transactional parquet tables — the local Iceberg stand-in.

The sandbox has no Iceberg runtime jars, so the engine ships a minimal
transactional table layer with the same contract the sink needs from
Iceberg on a real cluster:

  * atomic snapshot commits (manifest file listing data files, swapped
    by atomic rename of a CURRENT pointer)
  * keyed MERGE upsert with bucket-level rewrite (only buckets touched
    by the batch are rewritten — the local analog of Iceberg's
    file-pruned MERGE INTO ... ON key)
  * idempotent replay: every commit records its batch_id; re-committing
    a batch_id is a no-op. This is what turns Structured Streaming's
    at-least-once batch replay into exactly-once
    (Hydra analog: AtLeastOnceDelivery + downstream key compaction,
    reference core/src/main/scala/hydra/core/transport/Transport.scala:13-49
    and AckStrategy.scala:35-45 — our 'replicated' mode).
  * tombstone deletes: rows flagged ``_delete`` remove their key
    (Hydra null-payload deletion, HydraRequest.scala:7, MERGE ... DELETE).

On a real cluster, swap TransactionalTable for
``spark.sql("MERGE INTO ...")`` against an Iceberg catalog — the sink
API (hydra_spark.sink) is written against this interface only.

Single-writer by design: the only writer is the streaming query's
foreachBatch on the driver, mirroring one-query-per-table ownership.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class TransactionalTable:
    def __init__(self, path: str, key_cols: list[str], n_buckets: int = 32):
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        if self._current_version() is None:
            self._write_manifest({"version": 0, "files": {}, "committed_batches": [], "key_cols": self.key_cols})

    # ---------------------------------------------------------- manifest
    def _current_path(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_version(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def manifest(self) -> dict:
        v = self._current_version()
        with open(os.path.join(self.path, "manifests", f"v{v}.json")) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        v = m["version"]
        mp = os.path.join(self.path, "manifests", f"v{v}.json")
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mp)
        ptmp = self._current_path() + ".tmp"
        with open(ptmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptmp, self._current_path())  # atomic snapshot swap

    def committed_batches(self) -> set:
        return set(self.manifest()["committed_batches"])

    # ---------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        m = self.manifest()
        files = [p for fl in m["files"].values() for p in fl]
        if not files:
            # empty table with correct key schema is the caller's problem;
            # return empty DF from schema hint if any data ever existed
            return spark.createDataFrame([], schema="dummy string").limit(0)
        return spark.read.parquet(*files)

    def is_empty(self) -> bool:
        return not any(self.manifest()["files"].values())

    # ---------------------------------------------------------- write
    def _bucket_col(self):
        return F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets))

    def merge_upsert(self, spark: SparkSession, batch: DataFrame, batch_id) -> bool:
        """MERGE batch INTO table ON key_cols; idempotent per batch_id.

        Latest-wins within the batch is the caller's duty (sink dedups
        first). Rows with boolean column ``_delete`` = true delete their
        key. Returns False if batch_id was already committed (replay).
        """
        m = self.manifest()
        if batch_id in m["committed_batches"]:
            return False  # replayed batch — exactly-once guarantee

        has_delete = "_delete" in batch.columns
        batch = batch.withColumn("_bucket", self._bucket_col())
        affected = [r[0] for r in batch.select("_bucket").distinct().collect()]

        old_files = {int(k): v for k, v in m["files"].items()}
        read_files = [p for b in affected for p in old_files.get(int(b), [])]

        if read_files:
            existing = spark.read.parquet(*read_files).withColumn("_bucket", self._bucket_col())
            if has_delete and "_delete" not in existing.columns:
                existing = existing.withColumn("_delete", F.lit(False))
            # anti-join out keys present in the batch, then union the batch
            merged = existing.join(
                batch.select(*self.key_cols).distinct(), on=self.key_cols, how="left_anti"
            ).unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        if has_delete:
            merged = merged.where(~F.coalesce(F.col("_delete"), F.lit(False))).drop("_delete")

        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.path, "data", f"c{commit_id}")
        (
            merged.repartition(max(1, len(affected)), "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )
        new_files = dict(m["files"])
        written = set()
        for entry in os.listdir(out_dir):
            if entry.startswith("_bucket="):
                b = int(entry.split("=")[1])
                written.add(b)
                new_files[str(b)] = [
                    os.path.join(out_dir, entry, f)
                    for f in os.listdir(os.path.join(out_dir, entry))
                    if f.endswith(".parquet")
                ]
        # buckets that were affected but produced no output (all deleted)
        for b in affected:
            if int(b) not in written:
                new_files[str(b)] = []

        self._write_manifest(
            {
                "version": m["version"] + 1,
                "files": new_files,
                "committed_batches": m["committed_batches"] + [batch_id],
                "key_cols": self.key_cols,
            }
        )
        return True


    def append_dedup(self, spark: SparkSession, batch: DataFrame, batch_id) -> bool:
        """Keyed insert-only commit: rows whose key already exists are
        dropped (first-wins); **no existing file is rewritten**.

        This is the streaming-append fast path. merge_upsert is
        copy-on-write (rewrites every touched bucket — O(table) per
        batch once all buckets are touched); append_dedup is the
        merge-on-read analog (Iceberg `MERGE ... WHEN NOT MATCHED THEN
        INSERT`): cost is O(batch) + one column-pruned key scan. For an
        append-mostly stream keyed by (clip_id, window_start) this is
        the difference between per-batch commit time growing with table
        size and staying flat. Latest-wins/tombstone workloads still use
        merge_upsert. Idempotent per batch_id like merge_upsert.
        """
        m = self.manifest()
        if batch_id in m["committed_batches"]:
            return False

        batch = batch.withColumn("_bucket", self._bucket_col())
        old_files = [p for fl in m["files"].values() for p in fl]
        if old_files:
            existing_keys = spark.read.parquet(*old_files).select(*self.key_cols)
            batch = batch.join(existing_keys, on=self.key_cols, how="left_anti")

        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.path, "data", f"c{commit_id}")
        (
            batch.repartition(self.n_buckets, "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )
        new_files = {k: list(v) for k, v in m["files"].items()}
        for entry in os.listdir(out_dir):
            if entry.startswith("_bucket="):
                b = entry.split("=")[1]
                new_files.setdefault(b, [])
                new_files[b] += [
                    os.path.join(out_dir, entry, f)
                    for f in os.listdir(os.path.join(out_dir, entry))
                    if f.endswith(".parquet")
                ]
        self._write_manifest(
            {
                "version": m["version"] + 1,
                "files": new_files,
                "committed_batches": m["committed_batches"] + [batch_id],
                "key_cols": self.key_cols,
            }
        )
        return True


class AppendTable:
    """Append-only table (metrics / lineage / quarantine) with batch-id
    idempotence via deterministic per-batch file names.

    Small per-batch row sets (one row per source partition for lineage,
    a handful for metrics) are written driver-side as single parquet
    files named by batch_id — a replayed batch overwrites its own file,
    so replays cannot double-append (Hydra analog: KafkaRecordMetadata
    per-delivery bookkeeping, producer/KafkaRecordMetadata.scala:16-40).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def append_pandas(self, pdf, batch_id) -> None:
        tmp = os.path.join(self.path, f"batch-{batch_id}.parquet.tmp")
        dst = os.path.join(self.path, f"batch-{batch_id}.parquet")
        pdf.to_parquet(tmp, index=False)
        os.rename(tmp, dst)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def is_empty(self) -> bool:
        return not any(f.endswith(".parquet") for f in os.listdir(self.path))


def bootstrap(root: str, output_keys: list[str], n_buckets: int = 32) -> dict:
    """Create the engine's table set (Hydra Bootstrap.scala:25-80 analog):
    output (keyed), _metrics, _lineage, _quarantine."""
    return {
        "output": TransactionalTable(os.path.join(root, "output"), output_keys, n_buckets),
        "metrics": AppendTable(os.path.join(root, "_metrics")),
        "lineage": AppendTable(os.path.join(root, "_lineage")),
        "quarantine": AppendTable(os.path.join(root, "_quarantine")),
    }


def drop(root: str) -> None:
    shutil.rmtree(root, ignore_errors=True)
