"""Bucketed tile storage (co-partitioned joins) + adaptive kNN."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark):
    from trefoil_spark.grid.bbox import BBox
    from trefoil_spark.raster.gridspec import GridSpec
    from trefoil_spark.raster.rasterize import rasterize_zones
    from trefoil_spark.raster.synth import synthetic_tiles
    from trefoil_spark.sources.tiles_store import cokeyed_join, write_tiles_bucketed
    from trefoil_spark.sources.zones import ZONE_LAYER

    spec = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 1024, 512)
    tiles = synthetic_tiles(spark, spec)
    ztiles = rasterize_zones(spark, spec, ZONE_LAYER).withColumnRenamed(
        "zone_block", "block2"
    )

    import shutil

    for t in ("t_values", "t_zones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    write_tiles_bucketed(tiles, "t_values", n_buckets=4)
    write_tiles_bucketed(
        ztiles.select("ty", "tx", "block2", "h", "w").withColumn("cell", F.lit(0)),
        "t_zones",
        n_buckets=4,
    )
    joined = cokeyed_join(spark.table("t_values"), spark.table("t_zones"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # bucketed-on-join-key tables: no shuffle exchanges in the join
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == 2 * 4  # all tiles matched


def test_adaptive_knn_is_complete(spark, sf_dir):
    from trefoil_spark.operators.knn import knn_join_adaptive, knn_join_bruteforce
    from trefoil_spark.sources.pages import build_pages

    pages = build_pages(spark, sf_dir, with_html=False).select("doc_id", "lon", "lat")
    queries = pages.filter(F.col("doc_id") % 40 == 0)
    # start at a res/ring that is NOT sufficient at ring 1 for all queries
    got = (
        knn_join_adaptive(pages, queries, k=4, res=9, max_ring=64)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        knn_join_bruteforce(pages, queries, k=4)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_kmeans_lloyd_quantized_matches_numpy(spark, sf_dir):
    """Distributed quantized Lloyd's equals a numpy replay of the same
    quantized algorithm, and iterating reduces total within-cluster
    distance."""
    import numpy as np

    from trefoil_spark.operators.similarity import kmeans_lloyd_quantized

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = sorted(
        (r["vec_id"], np.round(np.asarray(r["embedding"], dtype=np.float64) * 1e6)
         .astype(np.int64))
        for r in emb.select("vec_id", "embedding").collect()
    )
    X = np.stack([v for _, v in rows])
    K = 4

    def replay(n_iters):
        cents = X[:K].copy()
        for _ in range(n_iters):
            d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # argmin ties -> smallest k, same rule
            dist = d[np.arange(len(X)), assign]
            new = []
            for k in sorted(set(assign.tolist())):
                sel = X[assign == k]
                new.append(np.floor(sel.sum(axis=0) / len(sel)).astype(np.int64))
            cents = np.stack(new)
        return assign, dist

    for iters in (1, 2):
        got = {r["cid"]: (r["n_points"], r["sum_dist"]) for r in
               kmeans_lloyd_quantized(emb, n_centroids=K, n_iters=iters).collect()}
        assign, dist = replay(iters)
        want = {}
        for k in sorted(set(assign.tolist())):
            sel = assign == k
            want[k] = (int(sel.sum()), int(dist[sel].sum()))
        assert got == want
    _, d1 = replay(1)
    _, d2 = replay(2)
    assert d2.sum() <= d1.sum()  # Lloyd monotonicity (quantization-tolerant)
