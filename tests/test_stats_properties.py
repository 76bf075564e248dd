"""Property tests for the late-round statistics: KS, vocabulary coverage,
Gini gain, and the join-cardinality estimator (oracle parity pins exact
values; these pin the statistics' SEMANTICS)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ks_statistic_bounds_and_location(spark, sf_dir):
    from exact_spark.operators.metrics import ml_ks_statistic

    r = ml_ks_statistic(spark, sf_dir).collect()[0]
    assert 0.0 <= r["ks_statistic"] <= 1.0
    assert r["n_train"] > r["n_test"] > 0  # 85/15 positional split


def test_vocab_coverage_monotone_in_k(spark, sf_dir):
    from exact_spark.operators.text import text_vocab_coverage

    rows = sorted(
        text_vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["vocab_size"]
    )
    covs = [r["coverage"] for r in rows]
    assert all(0.0 <= c <= 1.0 for c in covs)
    assert all(b >= a for a, b in zip(covs, covs[1:]))  # more vocab, more mass
    for r in rows:
        assert r["oov_rate"] == pytest.approx(1.0 - r["coverage"])
        # K >= corpus type count means full coverage
        if r["vocab_size"] >= r["corpus_types"]:
            assert r["coverage"] == pytest.approx(1.0)


def test_gini_gain_nonnegative(spark, sf_dir):
    from exact_spark.operators.metrics import ml_gini_gain

    rows = ml_gini_gain(spark, sf_dir).collect()
    assert len(rows) == 3
    # split gain of a partition can never be negative (Gini is concave)
    assert all(r["gini_gain"] >= -1e-12 for r in rows)


def test_cardinality_estimate_exact_for_pk_fk(spark, sf_dir):
    """orders.o_orderkey is a PK: max(ndv) == n_orders, so the textbook
    estimate n_l*n_o/max(ndv) collapses to exactly n_lineitem — the
    estimator must be EXACT on PK-FK joins, which is why CBOs trust it."""
    from exact_spark.operators.relational import rel_join_cardinality_check

    r = rel_join_cardinality_check(spark, sf_dir).collect()[0]
    assert r["ndv_orders_key"] == r["n_orders"]
    assert r["estimated_join_rows"] == r["actual_join_rows"] == r["n_lineitem"]
    assert r["est_over_actual"] == pytest.approx(1.0)


def test_norm_profile_all_vectors_counted(spark, sf_dir):
    from exact_spark import io
    from exact_spark.operators.similarity import emb_norm_profile

    rows = emb_norm_profile(spark, sf_dir).collect()
    total = sum(r["n_vectors"] for r in rows)
    assert total == io.load(spark, sf_dir, "embeddings").count()
    for r in rows:
        assert r["min_norm_sq"] <= r["mean_norm_sq"] <= r["max_norm_sq"]
        assert r["n_zero_vectors"] >= 0
