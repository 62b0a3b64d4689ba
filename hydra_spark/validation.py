"""Admission validation — Hydra's strict/relaxed + logical-type + size rules.

Reference semantics re-expressed as DataFrame predicates:

  * Strict vs Relaxed schema validation: Hydra rejects payloads with
    fields not in the schema under Strict, ignores them under Relaxed
    (avro/src/main/scala/hydra/avro/convert/StringToGenericRecord.scala:28-51,
    ValidationStrategy in core). Here: strict -> raise on unexpected
    columns; relaxed -> ``select`` only the declared columns (column
    pruning, free in Catalyst).
  * timestamp-millis > 0 rule (StringToGenericRecord.scala:65-67,
    opt-in per topic at IngestionFlowV2.scala:79-91): rows with
    event_time <= epoch are quarantined, never crash the stream.
  * Record size limit -> RecordTooLarge
    (KafkaClientAlgebra.scala:204-215 checkSizeLimit): oversized rows
    are quarantined with reason, not failed.

All checks are JVM-side Column predicates — one pass, whole-stage
codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EXPECTED_COLS = [
    "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
    "ingest_partition", "ingest_offset", "event_time",
]


class ExtraFieldsError(ValueError):
    """Strict-mode rejection (Hydra ValidationExtraFieldsError)."""


def conform_schema(df: DataFrame, strict: bool, expected: list[str] | None = None) -> DataFrame:
    expected = expected or [c for c in EXPECTED_COLS if c in df.columns or strict]
    declared = [c for c in expected if c in df.columns]
    extra = [c for c in df.columns if c not in expected]
    if extra and strict:
        raise ExtraFieldsError(f"unexpected fields under strict validation: {extra}")
    return df.select(*declared)


def admission_checks(
    df: DataFrame,
    max_bytes: int | None = None,
    enforce_positive_ts: bool = True,
) -> DataFrame:
    """Adds ``reject_reason`` (NULL = admitted). Single projection."""
    reason = F.lit(None).cast("string")
    if enforce_positive_ts:
        reason = F.when(
            F.col("event_time") <= F.timestamp_seconds(F.lit(0)), F.lit("InvalidLogicalType:timestamp-millis<=0")
        ).otherwise(reason)
    if max_bytes is not None:
        reason = F.when(
            F.length(F.col("bytes")) > max_bytes,
            F.concat(F.lit("RecordTooLarge:"), F.length("bytes").cast("string"), F.lit(f">{max_bytes}")),
        ).otherwise(reason)
    return df.withColumn("reject_reason", reason)


def split_admitted(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(admitted, quarantine) on reject_reason."""
    return (
        df.where(F.col("reject_reason").isNull()).drop("reject_reason"),
        df.where(F.col("reject_reason").isNotNull()),
    )
