"""Document deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline operators over a `documents(doc_id, text, ...)`
table. Scale posture per operator:

  * exact        — hash-groupBy on the text; one shuffle on a digest key
                   (never shuffle the full text at 100 TB — group on
                   md5 and keep min(doc_id) per group).
  * ngram_jaccard— EXACT all-pairs similarity via shared-shingle join.
                   The candidate join is bounded by dropping stop-grams
                   (document frequency > max_df): at web scale a gram
                   appearing in 1M docs would otherwise create 10^12
                   join rows. Verification math is exact set Jaccard.
  * minhash_lsh  — the scale path: 128-perm MinHash signatures
                   (vectorized numpy over Arrow batches) → banded LSH
                   bucketing → bucket join on (band, band_hash) →
                   exact-Jaccard verification of candidates only.
                   O(docs × bands) shuffle rows instead of O(pairs).
  * simhash      — 64-bit SimHash + chunk-pigeonhole candidate
                   generation, hamming-distance verification.

Shingling/hashing uses Spark's JVM-side xxhash64 so the expensive
text → token-hash step never leaves whole-stage codegen; only the
fixed-width signature math runs in (vectorized) pandas UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- shingles

def word_ngrams(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, gram) distinct word n-grams, JVM-side only."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(words) - F.lit(n))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)])
    )
    out = df.select(
        F.col(id_col), F.explode(F.when(F.size(words) >= n, grams).otherwise(F.array())).alias("gram")
    )
    return out.distinct()


# ---------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per exact text; groups on md5 digest."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_digest"))
        .groupBy("_digest")
        .agg(F.min(id_col).alias("rep_doc_id"), F.count("*").alias("n_copies"))
        .select("rep_doc_id", "n_copies")
    )


# ---------------------------------------------------------------- exact jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.05,
    n: int = 3,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All (d1 < d2) pairs with exact n-gram Jaccard >= threshold.

    max_df: drop grams appearing in more than max_df docs before the
    candidate join (web-scale guard; None = exact over all grams).
    Output: (d1, d2, jaccard rounded 4).
    """
    g = word_ngrams(df, n, text_col, id_col)
    counts = g.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    cand_g = g
    if max_df is not None:
        keep = g.groupBy("gram").agg(F.count("*").alias("df")).where(F.col("df") <= max_df)
        cand_g = g.join(keep.select("gram"), "gram")
    a = cand_g.select(F.col(id_col).alias("d1"), "gram")
    b = cand_g.select(F.col(id_col).alias("d2"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("d1"), F.col("n_grams").alias("n1"))
    cb = counts.select(F.col(id_col).alias("d2"), F.col("n_grams").alias("n2"))
    j = (
        inter.join(ca, "d1")
        .join(cb, "d2")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 4))
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("d1", "d2", "jaccard")


# ---------------------------------------------------------------- minhash + LSH

def _minhash_udf(n_perm: int, seed: int):
    rng = np.random.default_rng(seed)
    A = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    B = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(gram_hashes: pd.Series) -> pd.Series:
        out = []
        for hs in gram_hashes:
            if hs is None or len(hs) == 0:
                out.append(np.full(n_perm, _MERSENNE, dtype=np.int64))
                continue
            h = np.asarray(hs, dtype=np.uint64).astype(np.int64) & ((1 << 61) - 1)
            # (n_perm, n_grams) affine perms mod Mersenne prime, min per perm
            m = (A[:, None] * h[None, :] + B[:, None]) % _MERSENNE
            out.append(m.min(axis=1))
        return pd.Series(out)

    return minhash


def minhash_signatures(
    df: DataFrame, n_perm: int = 128, n: int = 3, seed: int = 42,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[n_perm]) — shingle hashing JVM-side,
    signature math vectorized numpy."""
    g = word_ngrams(df, n, text_col, id_col).select(
        F.col(id_col), F.xxhash64("gram").alias("gh")
    )
    per_doc = g.groupBy(id_col).agg(F.collect_list("gh").alias("gram_hashes"))
    mh = _minhash_udf(n_perm, seed)
    return per_doc.select(F.col(id_col), mh(F.col("gram_hashes")).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
    verify: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH; optionally
    verified with exact n-gram Jaccard >= threshold on candidates only."""
    rows = n_perm // bands
    sigs = minhash_signatures(df, n_perm, n, seed, text_col, id_col)
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))).alias("bh"),
            ),
        )
    ).alias("bb")
    buckets = sigs.select(F.col(id_col), band_cols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = buckets.select(F.col(id_col).alias("d1"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("d2"), "band", "bh")
    cand = a.join(b, ["band", "bh"]).where(F.col("d1") < F.col("d2")).select("d1", "d2").distinct()
    if not verify:
        return cand
    # the candidate set is referenced three times by the verifier —
    # cache it so the MinHash signatures + banding compute once
    # (Spark evicts LRU; at scale this is a small (d1, d2) table)
    cand = cand.persist()
    return exact_jaccard_of_pairs(df, cand, n=n, text_col=text_col, id_col=id_col).where(
        F.col("jaccard") >= threshold
    )


def exact_jaccard_of_pairs(
    df: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN candidate-pair set only.

    The LSH verification stage: cost is O(candidate docs' grams), never
    O(all-pairs) — at web scale the candidate set is what makes MinHash
    LSH tractable, so the verifier must not fan back out to a full
    shared-gram self-join. Output: (d1, d2, jaccard rounded 4).
    """
    docs = pairs.select(F.col("d1").alias(id_col)).union(
        pairs.select(F.col("d2").alias(id_col))
    ).distinct()
    # grams of candidate docs feed three consumers (counts, both join
    # sides) — cache to shingle once
    g = word_ngrams(df.join(docs, id_col), n, text_col, id_col).persist()
    counts = g.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    # intersection per candidate pair: route each pair's two gram sets
    # together by joining grams to the pair list on each side
    g1 = g.select(F.col(id_col).alias("d1"), "gram")
    g2 = g.select(F.col(id_col).alias("d2"), "gram")
    inter = (
        pairs.join(g1, "d1")
        .join(g2, ["d2", "gram"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("d1"), F.col("n_grams").alias("n1"))
    cb = counts.select(F.col(id_col).alias("d2"), F.col("n_grams").alias("n2"))
    return (
        pairs.join(inter, ["d1", "d2"], "left")
        .join(ca, "d1")
        .join(cb, "d2")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("n1") + F.col("n2") - F.coalesce(F.col("n_inter"), F.lit(0))),
                4,
            ),
        )
        .select("d1", "d2", "jaccard")
    )


# ---------------------------------------------------------------- simhash

def _simhash_udf(seed: int = 0):
    @F.pandas_udf(T.LongType())
    def simhash(token_hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(token_hashes), dtype=np.int64)
        for k, hs in enumerate(token_hashes):
            if hs is None or len(hs) == 0:
                continue
            h = np.asarray(hs, dtype=np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.nonzero(v > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bit)
            out[k] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return simhash


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(id_col, F.xxhash64("tok").alias("th"))
    per_doc = toks.groupBy(id_col).agg(F.collect_list("th").alias("token_hashes"))
    sh = _simhash_udf()
    return per_doc.select(F.col(id_col), sh(F.col("token_hashes")).alias("simhash"))


def simhash_pairs(
    df: DataFrame, max_hamming: int = 8, chunks: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs sharing >=1 of `chunks` 16-bit simhash chunks,
    verified hamming(sig1, sig2) <= max_hamming."""
    sigs = simhash_signatures(df, text_col, id_col)
    width = 64 // chunks
    chunk_structs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), c * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("cv"),
                )
                for c in range(chunks)
            ]
        )
    ).alias("cc")
    buckets = sigs.select(F.col(id_col), F.col("simhash"), chunk_structs).select(
        id_col, "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv")
    )
    a = buckets.select(F.col(id_col).alias("d1"), F.col("simhash").alias("s1"), "chunk", "cv")
    b = buckets.select(F.col(id_col).alias("d2"), F.col("simhash").alias("s2"), "chunk", "cv")
    cand = (
        a.join(b, ["chunk", "cv"]).where(F.col("d1") < F.col("d2")).select("d1", "d2", "s1", "s2").distinct()
    )
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "d1", "d2", "hamming"
    )
