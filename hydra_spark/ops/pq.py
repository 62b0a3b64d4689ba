"""Product quantization (PQ) — compressed-domain ANN, the third family.

Completes the ANN surface next to LSH (ops/similarity.lsh_topk) and IVF
(ivf_topk): PQ is the FAISS-standard memory-side answer — each vector is
encoded as m sub-codebook ids (here 8 bytes instead of 256 bytes of
floats, 32x), candidate scoring runs over the CODES via asymmetric
distance computation (ADC: per query, an m x k lookup table of exact
query-to-centroid sub-distances; a vector's approximate distance is m
table lookups), and an exact re-rank of a fixed-size shortlist restores
recall (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — IVFADC + re-rank recipe).

Spark shapes:

  * train  — per-subspace L2 k-means, all m subspaces in one
    distributed pass per iteration: assignment is a stacked-matmul
    pandas UDF (argmin via ||x||² - 2x·c + ||c||², no per-row Python);
    the update is a posexplode → (sub, code, pos) partial-aggregated
    mean — one map-side-combined exchange of m·k·(D/m) = k·D cells per
    iteration, never the vectors. Same contract as similarity.ivf_train:
    seeded and reproducible to ~1 ulp (distributed float mean is not
    associative), so consumers assert BOUNDS, not bitwise equality.
  * encode — one pandas-UDF pass: vector -> array<int> of m code ids.
  * adc_topk — queries' lookup tables broadcast (|Q| · m · k floats,
    metadata-scale); the ADC scan is a JVM ``aggregate`` over the codes
    column (the corpus side moves 8-byte codes, not 256-byte vectors);
    shortlist = per-query top-S by ADC (window over the scored rows);
    exact re-rank joins full vectors back for shortlist rows only.

At 10^12 vectors the ADC scan reads the code column only — the
compression is the point: the working set shrinks 32x and the exact
vectors are fetched for |Q| · shortlist rows, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def _subspaces(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 32,
    iters: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Train the (m, k, dim/m) codebook distributed; only k·dim floats
    of model parameters return to the driver per iteration. Init is a
    seeded hash-ordered sample of the data itself (k-means++-lite:
    distinct real vectors, deterministic under any partitioning)."""
    ds = _subspaces(dim, m)
    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.repartition(base.sparkSession.sparkContext.defaultParallelism).persist()
    try:
        # deterministic data-derived init: k vectors in md5(id||seed) order
        first = (
            base.withColumn("_h", F.md5(F.concat(F.col("_id").cast("string"), F.lit(str(seed)))))
            .orderBy("_h")
            .limit(k)
            .collect()
        )
        V0 = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in first])
        books = np.stack([V0[:, s * ds : (s + 1) * ds] for s in range(m)]).copy()

        for _ in range(iters):
            enc = _encode_udf(books)
            cells = (
                base.select(F.posexplode(enc(F.col("_v"))).alias("sub", "code"), F.col("_v"))
                .select(
                    "sub",
                    "code",
                    F.posexplode(
                        F.slice(F.col("_v"), F.col("sub") * ds + 1, ds)
                    ).alias("pos", "x"),
                )
                .groupBy("sub", "code", "pos")
                .agg(F.avg("x").alias("mean"))
                .collect()
            )
            new = books.copy()  # empty cells keep their centroid
            for r in cells:
                new[r["sub"], r["code"], r["pos"]] = r["mean"]
            books = new
        return books
    finally:
        base.unpersist()


def _encode_udf(books: np.ndarray):
    """vector -> array<int> of m sub-code ids; one stacked matmul per
    subspace per Arrow batch."""
    m, k, ds = books.shape
    # ||x - c||^2 argmin == argmin(||c||^2 - 2 x·c)
    c_norm2 = (books**2).sum(axis=2)  # (m, k)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        mask = np.array([v is not None for v in vecs])
        out = np.empty(len(vecs), dtype=object)
        for i in np.nonzero(~mask)[0]:
            out[i] = None
        if mask.any():
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
            codes = np.empty((V.shape[0], m), dtype=np.int32)
            for s in range(m):
                X = V[:, s * ds : (s + 1) * ds]
                codes[:, s] = (c_norm2[s][None, :] - 2.0 * (X @ books[s].T)).argmin(1)
            for i, row in zip(np.nonzero(mask)[0], codes):
                out[i] = row
        return pd.Series(list(out))

    return encode


def pq_encode(
    emb: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]) — the 32x-compressed corpus."""
    enc = _encode_udf(books)
    return emb.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    books: np.ndarray,
    query_ids: list[int],
    topk: int = 3,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC scan over codes + exact cosine re-rank of the per-query
    shortlist. Returns (q_id, vec_id, cos, rank) — rank 1..topk by
    exact cosine over the shortlist (ties broken by vec_id)."""
    m, k, ds = books.shape
    spark = emb.sparkSession
    q_rows = emb.where(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    if len(q_rows) != len(query_ids):
        raise ValueError("some query_ids missing from the corpus")

    # per-query exact sub-distance tables, flattened m*k (driver-built:
    # |Q|·m·k floats — metadata-scale, broadcast with the join)
    tab_rows = []
    for r in q_rows:
        q = np.asarray(r[vec_col], dtype=np.float64)
        tabs = np.stack(
            [((books[s] - q[s * ds : (s + 1) * ds]) ** 2).sum(axis=1) for s in range(m)]
        )
        tab_rows.append((int(r[id_col]), [float(x) for x in tabs.ravel()]))
    qt = spark.createDataFrame(tab_rows, f"q_id long, tabs array<double>")

    codes = pq_encode(emb, books, id_col, vec_col).where(F.col("codes").isNotNull())
    scored = codes.join(F.broadcast(qt), F.col(id_col) != F.col("q_id")).withColumn(
        "adc",
        F.expr(
            f"aggregate(zip_with(codes, sequence(0, {m - 1}), (c, s) -> tabs[s * {k} + c]),"
            " 0D, (acc, x) -> acc + x)"
        ),
    )
    short = (
        scored.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col(id_col).asc())
            ),
        )
        .where(F.col("_rn") <= shortlist)
        .select("q_id", id_col)
    )
    # exact re-rank: full vectors fetched for shortlist rows only
    qv = spark.createDataFrame(
        [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in q_rows],
        f"q_id long, q_vec array<double>",
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("q_vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    reranked = (
        short.join(emb.select(id_col, vec_col), id_col)
        .join(F.broadcast(qv), "q_id")
        .withColumn("cos", dot / (nrm(F.col(vec_col)) * nrm(F.col("q_vec"))))
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
            ),
        )
        .where(F.col("rank") <= topk)
        .select("q_id", id_col, F.round("cos", 6).alias("cos"), "rank")
    )
    return reranked
