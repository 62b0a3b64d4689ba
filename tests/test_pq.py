"""Product quantization: encode parity vs numpy, ADC table math, and
the recall floor of ADC+exact-re-rank against brute-force cosine."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(spark, emb):
    from hydra_spark.ops.pq import pq_train

    return pq_train(emb, m=8, k=32, iters=6, seed=42)


def test_pq_codebook_shape_and_encode_parity(spark, emb, books):
    from hydra_spark.ops.pq import pq_encode

    assert books.shape == (8, 32, 8)
    got = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].values).astype(np.float64)
    ids = pdf["vec_id"].values
    for s in range(8):
        X = V[:, s * 8 : (s + 1) * 8]
        d2 = ((X[:, None, :] - books[s][None]) ** 2).sum(-1)
        exp = d2.argmin(1)
        for i, vid in enumerate(ids):
            assert got[vid][s] == exp[i], (vid, s)


def test_pq_adc_rerank_recall_floor(spark, emb, books):
    """recall@3 of ADC shortlist-100 + exact re-rank vs brute force:
    measured 0.96 on this fixture; floor 0.88 absorbs the ~1 ulp
    nondeterminism of the distributed k-means mean."""
    from hydra_spark.ops.pq import pq_adc_topk

    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].values).astype(np.float64)
    ids = pdf["vec_id"].values
    norms = np.linalg.norm(V, axis=1)
    queries = list(range(25))
    got = {}
    for r in pq_adc_topk(emb, books, queries, topk=3, shortlist=100).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = tot = 0
    for q in queries:
        qi = np.nonzero(ids == q)[0][0]
        cos = (V @ V[qi]) / (norms * norms[qi])
        cos[qi] = -9
        exact = set(ids[np.argsort(-cos)[:3]])
        assert len(got[q]) == 3
        hits += len(exact & got[q])
        tot += 3
    assert hits / tot >= 0.88, f"recall@3 {hits/tot:.3f}"
