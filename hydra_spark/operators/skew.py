"""Skew-defeating salted repartition (SURVEY.md §2.8, §4).

The codec distribution is deliberately skewed (pcm16 ~80%). A plain
``repartition("codec")`` puts 80% of all rows in one task — at 1000
executors that is one straggler doing 80% of the decode work. Salting
by ``pmod(hash(clip_id), salt)`` alongside the natural keys spreads the
dominant codec across ``salt`` tasks while keeping (codec, sr_hz)
locality for downstream per-codec batch dispatch.

Hydra's analog is its per-format producer-actor fan-out
(reference: ingestors/kafka/src/main/scala/hydra/kafka/transport/
KafkaTransport.scala:90-95) — one actor per format is exactly the skew
this defeats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    *natural_keys: str,
    salt_col: str = "clip_id",
    salt: int | None = None,
) -> DataFrame:
    """Repartition by (natural keys..., pmod(hash(salt_col), salt))."""
    salt = salt or num_partitions
    keys = [F.col(k) for k in natural_keys] + [F.pmod(F.hash(F.col(salt_col)), F.lit(salt))]
    return df.repartition(num_partitions, *keys)
