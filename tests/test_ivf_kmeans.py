"""KMeans-trained IVF quality gate: the trained coarse quantizer must not
be worse than the seed-row centroids it replaces, measured by the engine's
own recall diagnostic on the same queries."""

from __future__ import annotations

from exact_spark.operators.similarity import (
    _N_CELLS,
    _TOP_K,
    sim_ivf_kmeans_recall,
    sim_ivf_recall,
    sim_topk_ivf_kmeans,
)


def test_kmeans_recall_at_least_seed_row(spark, sf_dir):
    seed = sim_ivf_recall(spark, sf_dir).toPandas()
    km = sim_ivf_kmeans_recall(spark, sf_dir).toPandas()
    assert len(seed) == len(km)
    assert km.recall_at_k.mean() >= seed.recall_at_k.mean()


def test_kmeans_ivf_result_shape(spark, sf_dir):
    got = sim_topk_ivf_kmeans(spark, sf_dir).toPandas()
    assert set(got.columns) == {"query_id", "neighbor_id", "neighbor_label", "cosine", "rank"}
    # every query returns a full top-k and ranks are 1..k
    by_q = got.groupby("query_id")["rank"].agg(["size", "min", "max"])
    assert (by_q["size"] == _TOP_K).all()
    assert (by_q["min"] == 1).all() and (by_q["max"] == _TOP_K).all()
    # deterministic across invocations (fixed seed, partition-stable sample)
    again = sim_topk_ivf_kmeans(spark, sf_dir).toPandas()
    a = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (a["neighbor_id"] == b["neighbor_id"]).all()


def test_kmeans_centroid_count(spark, sf_dir):
    # cells used by the index are a subset of the k trained centroids
    got = sim_topk_ivf_kmeans(spark, sf_dir)
    assert got.count() > 0
    assert _N_CELLS == 16
