"""Sequence packing — assign documents to fixed-token-budget packs.

The batch-assembly step of an LM training pipeline: documents are
concatenated into one virtual token stream in a deterministic global
order and the stream is cut every ``budget`` tokens; a document belongs
to the pack where it STARTS (the standard concatenate-then-chunk
packing of GPT-style pretraining — a document straddling a boundary
spills into the next pack rather than being reassigned).

The core primitive is a GLOBAL prefix sum, which naive Spark expresses
as a window over ``ORDER BY`` with no partition — a single-task sort
that dies at scale. This module implements the distributed two-phase
form:

  phase 1  bucket documents by an order-MONOTONE equal-width id range
           (bucket bounds from one min/max aggregate — no sampling, so
           the bucketing is deterministic across jobs, unlike
           repartitionByRange's reservoir sampler);
           one tiny aggregate computes per-bucket token totals, and the
           exclusive running offsets over the B bucket rows are folded
           driver-side (B = O(parallelism), metadata-scale).
  phase 2  one shuffle on the bucket key; within each bucket a window
           cumsum ordered by doc_id plus the broadcast bucket offset
           yields the exact global cumulative position.

Per-bucket work is N/B rows — the shape survives 10^12 documents by
raising B with the cluster. Skew is bounded because buckets are
equal-width id ranges over a dense id domain; for sparse/skewed id
domains swap the bucket expression for a quantile-based range map
(computed once, broadcast), the rest is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document pack assignment: (id, n_tokens, stream_start,
    pack_id). Token count is the whitespace definition shared with
    ``textstats.token_counts``; global order is ``id_col`` ascending.

    ``stream_start`` is the document's 0-based offset in the
    concatenated token stream and ``pack_id = stream_start // budget``
    — both exact, computed by the two-phase distributed prefix sum
    described in the module docstring (no global single-task sort).
    """
    tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = df.select(F.col(id_col), tok.alias("n_tokens"))

    lo, hi = base.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:  # empty corpus: return the (empty) output shape
        return base.select(
            id_col,
            "n_tokens",
            F.lit(None).cast("long").alias("stream_start"),
            F.lit(None).cast("long").alias("pack_id"),
        )
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    bucket = F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width)).cast("int")
    base = base.withColumn("_b", bucket)

    # phase 1: per-bucket totals -> exclusive offsets (metadata-scale)
    totals = {
        r["_b"]: r["t"]
        for r in base.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("_b"),
    )

    # phase 2: in-bucket cumsum + broadcast offset = global position
    cum = F.sum("n_tokens").over(
        W.partitionBy("_b").orderBy(id_col).rowsBetween(W.unboundedPreceding, 0)
    )
    start = (cum - F.col("n_tokens") + off).alias("stream_start")
    return base.select(id_col, "n_tokens", start).select(
        id_col,
        "n_tokens",
        "stream_start",
        F.floor(F.col("stream_start") / F.lit(budget)).cast("long").alias("pack_id"),
    )
