"""IVF similarity: structural correctness (list-consistency + within-list
ranking preserves the exact order) and determinism."""

import numpy as np
from pyspark.sql import functions as F


def test_ivf_ann(spark, sf_dir):
    from trefoil_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivf_assign_expr,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=8)
    assert cents.shape == (8, 64)
    # deterministic training
    cents2 = train_ivf_centroids(emb, n_centroids=8)
    assert np.array_equal(cents, cents2)

    queries = emb.filter(F.col("vec_id") < 5)
    approx = ivf_ann_topk(emb, queries, k=5, centroids=cents).toPandas()
    assert len(approx) > 0

    # list consistency: neighbor shares the query's IVF list
    assign = ivf_assign_expr("embedding", cents)
    lists = {
        r["vec_id"]: r["l"]
        for r in emb.selectExpr("vec_id", f"{assign} AS l").collect()
    }
    for q, n in zip(approx.query_id, approx.neighbor_id):
        assert lists[q] == lists[n]

    # within-list ranking preserves exact global cosine order
    exact = cosine_topk(emb, queries, k=emb.count()).toPandas()
    exact_rank = {
        (q, n): r
        for q, n, r in zip(exact.query_id, exact.neighbor_id, exact["rank"])
    }
    for q in approx.query_id.unique():
        sub = approx[approx.query_id == q].sort_values("rank")
        ranks = [exact_rank[(q, n)] for n in sub.neighbor_id]
        assert ranks == sorted(ranks)


def test_ivf_multiprobe_recall(spark, sf_dir):
    """n_probe widens recall monotonically and n_probe=K is EXACT (equal
    to brute-force top-k), all with zero Python in the probe math."""
    from trefoil_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))

    def recall(n_probe):
        got = ivf_ann_topk(emb, queries, k=5, centroids=cents, n_probe=n_probe)
        pairs = set(zip(*(c for _, c in got.toPandas()[
            ["query_id", "neighbor_id"]].items())))
        return len(pairs & exact_pairs) / len(exact_pairs)

    r1, r2, r8 = recall(1), recall(2), recall(8)
    # random embeddings cluster weakly, so recall ≈ n_probe/K — the
    # guaranteed properties are monotonicity and exactness at n_probe=K
    assert r1 <= r2 <= r8
    assert r8 == 1.0  # probing every list = exact
    assert r2 > r1 or r2 == 1.0


def test_ivf_probe_validation(spark, sf_dir):
    import pytest

    from trefoil_spark.operators.similarity import ivf_ann_topk, train_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=4)
    with pytest.raises(ValueError, match="n_probe"):
        ivf_ann_topk(emb, emb.limit(1), k=3, centroids=cents, n_probe=9)


def test_ivf_assign_linear_at_k256(spark):
    """The argmin expression is linear-size: at K=256 it must (a) agree
    with numpy's argmin (ties→smallest k) and (b) have O(K) expression
    text — the r2 CASE/LEAST chain was O(K²·dim) text, which blows the
    analyzer and costs K² distance evaluations per row long before
    K=256 (higher-order functions are interpreted, so text size IS the
    per-row cost)."""
    from trefoil_spark.operators.similarity import ivf_assign_expr

    rng = np.random.default_rng(3)
    dim, K, n = 16, 256, 200
    cents = rng.standard_normal((K, dim)).round(6)
    vecs = rng.standard_normal((n, dim)).round(6)
    want = (((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)).argmin(axis=1)

    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(n)],
        "vec_id int, embedding array<double>",
    )
    out = df.selectExpr("vec_id", f"{ivf_assign_expr('embedding', cents)} AS l")
    got = {r["vec_id"]: r["l"] for r in out.collect()}
    assert [got[i] for i in range(n)] == [int(w) for w in want]

    # linear text: 16x the centroids ⇒ ~16x the expression, not 256x
    len16 = len(ivf_assign_expr("embedding", cents[:16]))
    len256 = len(ivf_assign_expr("embedding", cents))
    assert len256 < 20 * len16
