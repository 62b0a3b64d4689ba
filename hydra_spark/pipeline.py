"""Flagship pipeline: source → validate → decode → join → window → sink.

This is the end-to-end CEP job the north rule describes, assembled from
the engine's operators. Architecture (deliberate, scale-driven):

  stream side, stateless prefix (runs before any state store):
      admission checks → salted repartition by (codec, sr_hz, salt) →
      vectorized Arrow decode — **drops the audio bytes**
  stream side, stateful (RocksDB-backed):
      decoded clips ⋈ transcript stream — interval join, watermarked
  batch side, per micro-batch (stateless, inside foreachBatch):
      transcript normalize → tumbling-window key → keyed MERGE +
      quarantine + lineage + metrics in one atomic commit

**Decode runs BEFORE the join — this ordering is load-bearing at scale.**
A stream-stream join buffers both inputs in the state store until the
watermark expires them; joining raw clips would put the ~10-60 KB audio
payload of every in-flight clip into RocksDB and re-checkpoint it every
micro-batch. Decoding first means the join shuffles and stores ~100 B
feature rows instead — measured locally this is the difference between
~190 clips/s and >1500 clips/s at local[8], and at 10^12-clip scale it
is the difference between a working pipeline and a state store holding
petabytes. (Same reasoning as Hydra running its record-factory transform
*before* the transport stage, not after —
core/src/main/scala/hydra/core/ingest/Ingestor.scala:57-92.)

Keeping exactly ONE stateful operator in the streaming plan (the join)
sidesteps Spark's chained-stateful-operator restrictions (SURVEY.md §7
risk) and keeps state-store size = join state only. Cross-batch
duplicate delivery is absorbed by the MERGE key (clip_id, window_start)
— idempotence replaces a second dedup state store; the standalone dedup
operator (operators/join.dedup_within_watermark) remains available and
tested for pipelines that need pre-join dedup.

A second, independent streaming query computes per-(window, codec)
aggregates in append mode (windows finalize at the watermark) — the CEP
rollup output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hydra_spark import tables as tbl, transforms, validation
from hydra_spark.functions.decode import decode_features
from hydra_spark.operators import windows as win
from hydra_spark.operators.join import clip_transcript_join
from hydra_spark.sink import ExactlyOnceSink
from hydra_spark.sources.replay import stream_table
from hydra_spark.synth import CLIPS_SCHEMA
from hydra_spark.transforms import (  # noqa: F401 (public re-exports)
    WINDOW_SIZE,
    window_start_col,
)

WATERMARK = "60 seconds"
JOIN_LO, JOIN_HI = "10 seconds", "60 seconds"


def _audio_schema():
    from pyspark.sql import types as T

    return T.StructType([f for f in CLIPS_SCHEMA.fields if f.name != "transcript"])


def _transcript_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("transcript", T.StringType(), True),
            T.StructField("event_time", T.TimestampType(), False),
        ]
    )


def pre_join_spec(
    num_partitions: int = 32,
    max_bytes: int | None = 4_000_000,
    salt: bool = True,
    drop_rejected: bool = True,
) -> transforms.Spec:
    """The flagship's stateless pre-join stage chain as a registry spec
    (the assembly the reference does through its component loader /
    record-factory lookup — RecordFactory.scala:25-30). Deployments
    extend or replace stages by name via transforms.register_stage and
    editing this list; see tests/test_transforms.py for a custom stage
    spliced into the chain."""
    spec: transforms.Spec = [("admission", {"max_bytes": max_bytes})]
    spec.append("drop_rejected" if drop_rejected else "null_rejected_payload")
    if salt:
        spec.append(("salt_spread", {"num_partitions": num_partitions}))
    spec += ["decode", "tag_decode_rejects"]
    return spec


def pre_join_transform(
    audio: DataFrame,
    num_partitions: int = 32,
    max_bytes: int | None = 4_000_000,
    salt: bool = True,
    drop_rejected: bool = True,
) -> DataFrame:
    """Stateless pre-join stage (Hydra's record-factory, run *before*
    transport): admission checks → salted repartition → vectorized
    decode. Drops ``bytes``; emits ``reject_reason`` (admission rule or
    decode error — first failure wins) for the sink's quarantine split.

    ``drop_rejected`` (default): admission-rejected rows leave the main
    stream here — BEFORE decode (an oversized payload must never be
    gathered into a decode batch) and before the watermarked join (a row
    rejected for ``timestamp-millis<=0`` has a garbage event time, so the
    join would silently discard it as late data — exactly the rows the
    admission rule exists to capture). They are delivered to the
    quarantine table by the stateless side stream
    (``start_quarantine_stream``) instead. With ``drop_rejected=False``
    rejected rows stay in-stream for the sink's split, but their payload
    is nulled out so decode never touches it (the admission reason still
    wins over the resulting null-bytes decode error).

    ``salt``: repartition by (codec, sr_hz, hash-salt) before decode.
    At scale the input table is typically partitioned by codec, so
    decode tasks would inherit the dominant-codec skew; the salt spreads
    them. This is the one place the encoded payload crosses a shuffle —
    after decode only ~100 B/row feature rows move.

    Assembled from the transform-stage registry (``pre_join_spec``);
    stage resolution happens here at build time, execution is still one
    Catalyst plan.
    """
    spec = pre_join_spec(
        num_partitions=num_partitions, max_bytes=max_bytes,
        salt=salt, drop_rejected=drop_rejected,
    )
    return transforms.build_transform(spec)(audio)


def finish_batch(batch_df: DataFrame) -> DataFrame:
    """Per-micro-batch stateless tail: transcript normalize + tumbling
    window key (the sink's MERGE key is (clip_id, window_start)) —
    registry-assembled like the pre-join chain."""
    return transforms.build_transform(
        ["normalize_transcript", ("window_key", {"size": WINDOW_SIZE})]
    )(batch_df)


def build_tables(root: str) -> dict:
    return tbl.bootstrap(root, ["clip_id", "window_start"])


def start_flagship(
    spark: SparkSession,
    audio_dir: str,
    transcripts_dir: str,
    out_root: str,
    files_per_trigger: int = 8,
    ack: str = "replicated",
    num_partitions: int | None = None,
    salt: bool = False,
    max_bytes: int | None = 4_000_000,
):
    """Start the enriched-output streaming query. Returns (query, sink).

    ``salt``: opt-in pre-decode salted repartition. Shuffling the encoded
    payload costs a full pass of the audio bytes over the wire, so it
    only pays when the SOURCE layout concentrates decode work (e.g. an
    input table partitioned by codec). Decode cost per sample is
    codec-independent, and codec-keyed aggregations downstream are
    already skew-safe via map-side partial aggregation + AQE — so the
    default pipeline decodes in place on source partitions."""
    num_partitions = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = build_tables(out_root)
    audio = stream_table(spark, audio_dir, schema=_audio_schema(), files_per_trigger=files_per_trigger)
    trs = stream_table(spark, transcripts_dir, schema=_transcript_schema(), files_per_trigger=files_per_trigger)
    # decode BEFORE the stateful join — join state must hold feature
    # rows, never audio payloads (see module docstring)
    decoded = pre_join_transform(audio, num_partitions, max_bytes=max_bytes, salt=salt)
    joined = clip_transcript_join(
        decoded, trs, lo=JOIN_LO, hi=JOIN_HI, how="left_outer",
        clip_watermark=WATERMARK, transcript_watermark=WATERMARK,
    )
    # append_dedup: the flagship output is append-only keyed by
    # (clip_id, window_start) — insert-only commits keep per-batch cost
    # flat as the table grows. Contract note: append_dedup is FIRST-wins
    # across micro-batches (a key committed in batch k keeps its row if
    # re-emitted in batch k+1 — e.g. a replayed noack publish); pipelines
    # that need cross-batch latest-wins (late transcript updates must
    # overwrite) use strategy="merge" (merge_upsert) instead.
    sink = ExactlyOnceSink(t, ["clip_id", "window_start"], ack=ack, strategy="append_dedup")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(finish_batch(batch_df), batch_id)

    # stamp the state-format marker. holds_custom_state=False: the
    # flagship's only stateful operator is the built-in stream-stream
    # join (Spark's layout, not ours), so unmarked pre-existing
    # checkpoints remain resumable; queries using the
    # applyInPandasWithState ops pass True (see operators/state.py)
    from hydra_spark.operators.state import pin_state_format

    pin_state_format(os.path.join(out_root, "_checkpoint"), holds_custom_state=False)
    q = (
        joined.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint"))
        .outputMode("append")
        .start()
    )
    return q, sink, t


def start_quarantine_stream(
    spark: SparkSession,
    audio_dir: str,
    out_root: str,
    files_per_trigger: int = 8,
    max_bytes: int | None = 4_000_000,
):
    """Stateless admission-reject delivery stream.

    Admission-rejected rows (RecordTooLarge, InvalidLogicalType:ts<=0)
    are split out of the main pipeline BEFORE its watermarked join —
    a ts-invalid row carries a garbage event time, so the stateful
    topology would silently drop it as late data and the quarantine
    table would undercount exactly the rows the admission rule exists
    to capture. This side stream re-reads the source stateless (no
    watermark, no state) and appends rejects idempotently per batch.
    (Kafka analog: a second cheap consumer on the same topic feeding the
    dead-letter table — Hydra publishes ingest errors to a side topic
    the same way, KafkaTransport.scala:56-59.)
    """
    t = build_tables(out_root)
    audio = stream_table(spark, audio_dir, schema=_audio_schema(), files_per_trigger=files_per_trigger)
    rejects = validation.admission_checks(audio, max_bytes=max_bytes).where(
        F.col("reject_reason").isNotNull()
    ).drop("bytes")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t["quarantine"].append_df(batch_df, f"adm-{batch_id}")

    q = (
        rejects.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint_quarantine"))
        .outputMode("append")
        .start()
    )
    return q, t


def start_window_rollup(
    spark: SparkSession,
    audio_dir: str,
    out_root: str,
    files_per_trigger: int = 8,
):
    """Independent per-(window, codec) rollup query (append mode —
    windows emit once, when the watermark passes)."""
    rollup_tbl = tbl.TransactionalTable(
        os.path.join(out_root, "rollup"), ["window_start", "codec"]
    )
    audio = stream_table(spark, audio_dir, schema=_audio_schema(), files_per_trigger=files_per_trigger)
    decoded = decode_features(audio).where(F.col("decode_error").isNull())
    agg = win.tumbling(
        decoded,
        WINDOW_SIZE,
        "codec",
        aggs=[
            F.count("*").alias("n_clips"),
            F.sum("n_samples").alias("total_samples"),
            F.avg("rms_db").alias("avg_rms_db"),
            F.max("peak").alias("max_peak"),
        ],
        watermark=WATERMARK,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rollup_tbl.merge_upsert(spark, batch_df, batch_id)

    q = (
        agg.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_root, "_checkpoint_rollup"))
        .outputMode("append")
        .start()
    )
    return q, rollup_tbl
