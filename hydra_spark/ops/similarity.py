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


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Decouple score/compute parallelism from the upstream file layout
    (a single-file corpus = one scan split; the per-vector dot-product
    work is orders of magnitude larger than the bytes scanned)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, id_col)


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
    base = _spread(emb, id_col).select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
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
    base = _spread(emb, id_col).select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
    a = base.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("_av"), F.col("_n").alias("_an"))
    b = base.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("_bv"), F.col("_n").alias("_bn"))
    j = a.crossJoin(b).where(F.col("v1") < F.col("v2"))
    cos = F.round(_dot("_av", "_bv") / (F.col("_an") * F.col("_bn")), 6)
    return j.select("v1", "v2", cos.alias("cosine")).where(F.col("cosine") >= threshold)


def lsh_dup(
    emb: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 40,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Bucketed cosine near-dup — the scale sibling of cosine_pairs
    (same output schema (v1, v2, cosine), no all-pairs term anywhere).

    Shape: hyperplane band buckets (shared with lsh_topk) self-joined on
    (band, bv), with the probe side exploded to its hamming-1 ball —
    bands*(1+width) rows/vector, LINEAR in corpus size; candidate pairs
    are deduped as bare ids and only then re-joined to vectors for the
    exact cosine verify (the minhash_lsh_dup candidate-only pattern —
    vectors never ride the bucket shuffle). Precision is exact (every
    emitted pair carries its true cosine); candidate recall for a pair
    at angle t: one bit agrees w.p. p = 1 - t/pi, a band hits w.p.
    p^w + w*p^(w-1)*(1-p), miss over 8 independent bands -> ~0.98 at
    cosine 0.4 (fixture-measured floor pinned by pytest). The pair
    relation is symmetric (probe ball radius 1), so v1 < v2 on the
    joined rows loses nothing."""
    width = n_bits // bands
    ids_b = _corpus_buckets(emb, n_bits, bands, seed, id_col, vec_col, dim).select(
        "neighbor_id", "band", "bv"
    )
    probes = ids_b.select(
        F.col("neighbor_id").alias("v1"),
        "band",
        F.explode(
            F.array(F.col("bv"), *[F.col("bv").bitwiseXOR(F.lit(1 << j)) for j in range(width)])
        ).alias("bv"),
    )
    buckets = ids_b.select(F.col("neighbor_id").alias("v2"), "band", "bv")
    cand = (
        probes.join(buckets, ["band", "bv"])
        .where(F.col("v1") < F.col("v2"))
        .select("v1", "v2")
        .distinct()
    )
    base = emb.select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
    a = base.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("_av"), F.col("_n").alias("_an"))
    b = base.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("_bv"), F.col("_n").alias("_bn"))
    cos = F.round(_dot("_av", "_bv") / (F.col("_an") * F.col("_bn")), 6)
    return (
        cand.join(a, "v1")
        .join(b, "v2")
        .select("v1", "v2", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------- IVF path

def _ivf_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    """Deterministic spherical centroids (seeded gaussian, L2-normalized).

    A trained k-means codebook drops in here unchanged (same shape); the
    seeded variant keeps the engine dependency-free and every run/test
    reproducible — the partitioning math downstream is identical."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_train(
    emb: DataFrame,
    n_lists: int = 16,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Spherical k-means (Lloyd) codebook for the IVF path, trained
    distributed: assignment is the same stacked-matmul pandas UDF the
    query path uses; the update step is a posexplode → (list, pos)
    partial-aggregated mean — one map-side-combined exchange of
    n_lists x dim cells per iteration, never the vectors themselves.
    Only the codebook (n_lists x dim floats — model parameters, not
    data) returns to the driver between iterations.

    At 10^12-vector scale you train on a sample (``sample_fraction``;
    the standard IVF recipe) and broadcast the codebook — the
    assignment/build cost is the full-corpus pass that follows in
    ivf_topk/index build, not this. Empty lists keep their previous
    centroid (the usual Lloyd fallback). Reproducible: seeded init and
    seeded sample give the same assignments every run; the distributed
    mean, however, merges per-partition partial sums in shuffle-fetch
    order, and float64 addition is not associative — repeated runs
    agree to ~1 ulp (allclose), NOT bitwise. Registry/oracle paths that
    need bitwise runs use the seeded codebook, not a trained one.

    Returns the codebook; pass it to ivf_topk(centroids=...).
    """
    base = _spread(emb, id_col).select(F.col(vec_col).alias("_v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.persist()
    try:
        centroids = _ivf_centroids(dim, n_lists, seed)
        for _ in range(iters):
            assign = _assign_udf(centroids, 1)
            cells = (
                base.select(F.explode(assign(F.col("_v"))).alias("list_id"), F.col("_v"))
                .select("list_id", F.posexplode("_v").alias("pos", "x"))
                .groupBy("list_id", "pos")
                .agg(F.avg("x").alias("mean"))
                .collect()
            )
            new = centroids.copy()  # empty lists keep their centroid
            for r in cells:
                new[r["list_id"], r["pos"]] = r["mean"]
            norms = np.linalg.norm(new, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            centroids = new / norms
        return centroids
    finally:
        base.unpersist()


def _assign_udf(centroids: np.ndarray, n_probe: int):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        """One stacked (batch, dim) @ (dim, n_lists) matmul per Arrow
        batch — no per-row Python."""
        mask = np.array([v is not None for v in vecs])
        out = np.empty(len(vecs), dtype=object)
        for i in np.nonzero(~mask)[0]:  # element-wise: a bulk boolean
            out[i] = []  # assignment would coerce [[]...] to a 2-D array
        if mask.any():
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
            sims = V @ centroids.T  # (batch, n_lists)
            top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
            for i, row in zip(np.nonzero(mask)[0], top):
                out[i] = row
        return pd.Series(list(out))

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
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """ANN top-k via inverted-file partitioning (the IVF scale path).

    Corpus vectors are assigned to their nearest centroid list (1 list
    each); queries probe their ``n_probe`` nearest lists; exact cosine
    re-ranks only the probed lists' vectors. At web scale the corpus is
    written PARTITIONED BY list_id, so a query reads n_probe/n_lists of
    the data — partition pruning does the candidate selection. Recall<1
    by construction — tested against the exact baseline, not an oracle.

    ``centroids``: a trained codebook (ivf_train) — defaults to the
    seeded deterministic one so registry/oracle runs stay reproducible.
    """
    if centroids is None:
        centroids = _ivf_centroids(dim, n_lists, seed)
    corpus_assign = _assign_udf(centroids, 1)
    query_assign = _assign_udf(centroids, n_probe)

    base = _spread(emb, id_col).select(F.col(id_col), F.col(vec_col), _norm_col(vec_col).alias("_n"))
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
    return _exact_rerank(cand, k)


def _write_index_params(path: str, filename: str, params: dict) -> None:
    import json
    import os

    with open(os.path.join(path, filename), "w") as f:
        json.dump(params, f)


def _check_index_params(path: str, filename: str, asked: dict) -> None:
    """Fail fast when a query's params don't match the ones the
    materialized index was built with — mismatched planes/codebooks
    probe the wrong partitions and silently return near-empty results."""
    import json
    import os

    pf = os.path.join(path, filename)
    if not os.path.exists(pf):
        # an index without its params sidecar cannot be validated — it
        # predates the sidecar contract or was partially written; serving
        # it silently would defeat the whole fail-fast guarantee
        raise ValueError(
            f"index at {path} has no {filename} params sidecar; rebuild the index"
        )
    with open(pf) as f:
        built = json.load(f)
    if any(built.get(k) != v for k, v in asked.items()):
        raise ValueError(
            f"index at {path} was built with { {k: built.get(k) for k in asked} }, "
            f"queried with {asked}; rebuild the index or match its params"
        )


def _exact_rerank(cand: DataFrame, k: int) -> DataFrame:
    """Shared IVF tail: exact cosine over candidate rows carrying
    (_qv, _qn, _cv, _cn), dedup across probe lists, row_number top-k."""
    cos = F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine")).distinct()
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_index_write(
    emb: DataFrame,
    path: str,
    n_lists: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: np.ndarray | None = None,
) -> str:
    """Materialize the inverted file PARTITIONED BY list_id — the
    at-scale layout ivf_topk's list equi-join models (same recipe as
    lsh_index_write: one write amortized over every query batch, a
    params sidecar so a mismatched query fails fast)."""
    if centroids is None:
        centroids = _ivf_centroids(dim, n_lists, seed)
    assign = _assign_udf(centroids, 1)
    rows = _spread(emb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm_col(vec_col).alias("_cn"),
        F.explode(assign(F.col(vec_col))).alias("list_id"),
    )
    rows.repartition("list_id").write.mode("overwrite").partitionBy("list_id").parquet(path)
    _write_index_params(path, "_ivf_params.json", {"n_lists": n_lists, "seed": seed, "dim": dim})
    return path


def ivf_index_topk(
    spark,
    path: str,
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
    """ANN top-k against a pre-materialized inverted file: the query
    batch's probe lists (computed driver-side from the same codebook)
    become a STATIC list_id IN-list, so the scan prunes to n_probe
    partitions per query. Output identical to ivf_topk at the same
    params (pytest parity)."""
    _check_index_params(
        path, "_ivf_params.json", {"n_lists": n_lists, "seed": seed, "dim": dim}
    )
    centroids = _ivf_centroids(dim, n_lists, seed)
    qrows = (
        emb.where(F.col(id_col).isin(query_ids) & F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qv = np.array([r[1] for r in qrows], dtype=np.float64)
    sims = qv @ centroids.T
    top = np.argsort(-sims, axis=1)[:, :n_probe]
    probe_rows = [
        (
            int(r[0]),
            int(lid),
            [float(x) for x in r[1]],
            float(np.linalg.norm(np.asarray(r[1], dtype=np.float64))),
        )
        for r, lids in zip(qrows, top)
        for lid in lids
    ]
    probe_df = spark.createDataFrame(
        probe_rows, "query_id long, list_id int, _qv array<float>, _qn double"
    )
    lists = sorted({lid for _, lid, _, _ in probe_rows})
    idx = spark.read.parquet(path)
    pruned = idx.where(F.col("list_id").isin([int(x) for x in lists]))
    cand = pruned.join(F.broadcast(probe_df), "list_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    return _exact_rerank(cand, k)


# ------------------------------------------------- LSH materialized index

def _band_probes(
    qids: list[int], vecs: np.ndarray, n_bits: int, bands: int, seed: int
) -> list[tuple[int, int, int]]:
    """Driver-side per-query probe list for a (small) query batch: own
    bucket + every hamming-1 neighbor per band — the same signatures
    the executor UDF computes (same planes, same seed), done in numpy
    on the handful of query vectors so the probe set can become STATIC
    partition filters. Returns (query_id, band, bv) rows."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, vecs.shape[1]))
    weights = (1 << np.arange(n_bits, dtype=np.uint64)).astype(np.float64)
    bits = (vecs @ planes.T) > 0
    sigs = (bits @ weights).astype(np.uint64)
    width = n_bits // bands
    mask = (1 << width) - 1
    out = set()
    for qid, s in zip(qids, sigs):
        for b in range(bands):
            bv = (int(s) >> (b * width)) & mask
            out.add((qid, b, bv))
            for j in range(width):
                out.add((qid, b, bv ^ (1 << j)))
    return sorted(out)


def lsh_index_write(
    emb: DataFrame,
    path: str,
    n_bits: int = 40,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """Materialize the corpus bucket table PARTITIONED BY (band, bv) —
    the at-scale layout the lsh_topk equi-join models. One row per
    (vector, band); a query then reads ONLY its probe buckets via
    static partition pruning (lsh_index_topk). At 10^12 vectors this is
    the difference between scanning bands/2^width of the corpus and
    scanning all of it."""
    rows = _corpus_buckets(emb, n_bits, bands, seed, id_col, vec_col, dim)
    # shuffle by the partition key before the dynamic-partition write:
    # without it every task writes a file into every (band, bv) dir —
    # tasks × bands × 2^width tiny files (measured 105 s at sf0.1);
    # with it each dir gets exactly its writers (256 files total here).
    # Same recipe at scale, with AQE coalescing small shuffle partitions.
    rows.repartition("band", "bv").write.mode("overwrite").partitionBy("band", "bv").parquet(path)
    _write_index_params(
        path, "_lsh_params.json",
        {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": dim},
    )
    return path


def _probe_join(
    corpus_rows: DataFrame,
    qrows: list,
    k: int,
    n_bits: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """Shared tail of both LSH top-k paths: driver-built probe rows
    (own bucket + hamming-1 per band, via _band_probes) broadcast-joined
    to corpus bucket rows (neighbor_id, _cv, _cn, band, bv), exact
    cosine re-rank of candidates only. The query batch is small by
    definition, so building its probe set driver-side costs one tiny
    collect and REMOVES a whole executor subtree (signature UDF +
    explode over the query side) from the plan — at small inputs the
    query is stage-count-bound, not data-bound."""
    spark = corpus_rows.sparkSession
    qids = [int(r[0]) for r in qrows]
    qv = np.array([r[1] for r in qrows], dtype=np.float64)
    per_q = _band_probes(qids, qv, n_bits, bands, seed)
    # one local DataFrame with the query vector inlined per probe row
    # (|Q| x bands x (1+width) rows — a few thousand at most): no
    # probe⋈query pre-join stage, just the single broadcast hash join
    # against the corpus buckets
    by_id = {
        int(r[0]): (
            [float(x) for x in r[1]],
            float(np.linalg.norm(np.asarray(r[1], dtype=np.float64))),
        )
        for r in qrows
    }
    probe_df = spark.createDataFrame(
        [(qid, b, bv, *by_id[qid]) for qid, b, bv in per_q],
        "query_id long, band int, bv int, _qv array<float>, _qn double",
    )
    cand = corpus_rows.join(F.broadcast(probe_df), ["band", "bv"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn")), 6)
    # a pair can meet in several probe buckets. dense_rank over the
    # (cosine desc, neighbor asc) ordering collapses those duplicates to
    # one rank, and the duplicates are ADJACENT under that ordering, so
    # a lag() in the same window (same exchange, same sort — zero extra
    # stages) filters them; no distinct exchange over the candidate set.
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.dense_rank().over(w))
        .withColumn("_prev", F.lag("neighbor_id").over(w))
        .where((F.col("rank") <= k) & (F.col("_prev").isNull() | (F.col("_prev") != F.col("neighbor_id"))))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_index_topk(
    spark,
    path: str,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_bits: int = 40,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a pre-materialized bucket index: the query
    batch's probe set (computed driver-side — the query side is small
    by definition) becomes a STATIC (band, bv) IN-list predicate, so
    Catalyst prunes the index scan to the probe partitions
    (PartitionFilters in the plan — asserted by tests/test_ops.py).
    Output and semantics identical to lsh_topk at the same params."""
    qrows = (
        # NULL-embedding queries contribute no probes (matches the
        # ivf/lsh paths, whose signature UDFs mask NULL vectors)
        emb.where(F.col(id_col).isin(query_ids) & F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qids = [int(r[0]) for r in qrows]
    qv = np.array([r[1] for r in qrows], dtype=np.float64)
    # fail fast if the probe params (incl. the ACTUAL query vector dim)
    # don't match the ones the index was built with — different planes
    # probe the wrong buckets and silently return near-empty results
    _check_index_params(
        path, "_lsh_params.json",
        {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": int(qv.shape[1])},
    )
    per_q = _band_probes(qids, qv, n_bits, bands, seed)
    # STATIC pruning predicate over the distinct probe buckets: literal
    # IN-list on the partition columns -> directory-level pruning
    buckets = sorted({(b, v) for _, b, v in per_q})
    idx = spark.read.parquet(path)
    pruned = idx.where(
        F.struct(F.col("band"), F.col("bv")).isin(
            [F.struct(F.lit(int(b)), F.lit(int(v))) for b, v in buckets]
        )
    )
    return _probe_join(pruned, qrows, k, n_bits, bands, seed)


# ---------------------------------------------------------------- LSH path

def _band_bucket_udf(dim: int, n_bits: int, bands: int, seed: int):
    """Signature + banding + norm in ONE Arrow round trip: returns
    (bvs: per-band bucket values indexed by band, n: L2 norm). Doing
    the band extraction in numpy (instead of sig → 8× shiftright/mask
    struct-array expressions JVM-side) keeps the Spark plan to a bare
    posexplode — measurably less codegen to compile on the first run,
    same rows out. NULL vectors return an empty bvs (no bucket rows
    after posexplode — parity with the NULL-probe policy)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    weights = (1 << np.arange(n_bits, dtype=np.uint64)).astype(np.float64)
    width = n_bits // bands
    shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))
    band_mask = np.uint64((1 << width) - 1)

    @F.pandas_udf("bvs array<int>, n double")
    def sigbv(vecs: pd.Series) -> pd.DataFrame:
        """Stacked matmul per Arrow batch; bit packing is a second
        matmul against powers of two — no per-row Python."""
        mask = np.array([v is not None for v in vecs])
        bvs = np.empty(len(vecs), dtype=object)
        norms = np.zeros(len(vecs))
        for i in np.nonzero(~mask)[0]:  # element-wise: a bulk boolean
            bvs[i] = []  # assignment would coerce [[]...] to a 2-D array
        if mask.any():
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
            bits = (V @ planes.T) > 0  # (batch, n_bits)
            sigs = (bits @ weights).astype(np.uint64)
            bvals = ((sigs[:, None] >> shifts[None, :]) & band_mask).astype(np.int32)
            for i, row in zip(np.nonzero(mask)[0], bvals):
                bvs[i] = row
            norms[mask] = np.linalg.norm(V, axis=1)
        return pd.DataFrame({"bvs": list(bvs), "n": norms})

    return sigbv


def _corpus_buckets(
    emb: DataFrame, n_bits: int, bands: int, seed: int, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Corpus bucket rows (neighbor_id, _cv, _cn, band, bv) — one row
    per (vector, band); the layout lsh_index_write pre-materializes
    PARTITIONED BY (band, bv) at scale."""
    sigbv = _band_bucket_udf(dim, n_bits, bands, seed)
    return (
        _spread(emb, id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            sigbv(F.col(vec_col)).alias("_s"),
        )
        .select(
            "neighbor_id", "_cv", F.col("_s.n").alias("_cn"),
            F.posexplode("_s.bvs").alias("band", "bv"),
        )
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_bits: int = 40,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: banded hyperplane-LSH with multi-probe, exact cosine
    re-rank of candidates only.

    Candidate generation is a hash EQUI-join on (band, band_signature)
    buckets — at web scale the corpus is written bucketed/partitioned by
    the band signature, so a query touches its probe buckets only,
    never the full corpus (a hamming-radius θ-join would be a
    broadcast nested loop over every corpus row — the non-scalable
    shape this op exists to avoid). Multi-probe: each query also probes
    every bucket within hamming distance 1 of its own band signature
    (band_width probes per band), recovering most of the recall a pure
    bucket hit misses. Recall < 1 by construction — measured against
    the exact baseline in tests, not an oracle.

    Banding (40 bits / 8 bands of width 5, grid-tuned on the near-random
    driver embeddings — LSH's hardest case): recall@3 0.97 vs 0.75 for
    the old 24/4 config at LOWER cost (narrower bands collide more per
    band; more bands multiply chances; probes/query = 8*(1+5) = 48).
    The corpus side signs every vector exactly once. The query side is
    built DRIVER-side (_band_probes over one tiny collect of the |Q|
    query vectors — same planes, same seed): at small inputs the query
    is stage-count-bound, not data-bound, and the collect removes a
    whole executor subtree (second signature-UDF invocation + probe
    explode) from the plan; at web scale |Q| is small by definition, so
    the collect stays tiny regardless of corpus size.
    """
    # NULL-embedding queries contribute no probes — parity with
    # lsh_index_topk and the IVF path
    qrows = (
        emb.where(F.col(id_col).isin(query_ids) & F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    c = _corpus_buckets(emb, n_bits, bands, seed, id_col, vec_col, dim)
    return _probe_join(c, qrows, k, n_bits, bands, seed)
