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


def test_roc_auc_semantics(spark, sf_dir):
    """AUC invariants: bounds, the Mann-Whitney identity on the recorded
    integer sums, and the constant-score degenerate case (all ties ->
    exactly 0.5 by the half-credit rule)."""
    from exact_spark.operators.metrics import ml_roc_auc

    r = ml_roc_auc(spark, sf_dir).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    # u2 is 2U; U is bounded by n_pos * n_neg
    assert 0 <= r["u2"] <= 2 * r["n_pos"] * r["n_neg"]
    assert r["auc"] == r["u2"] / (2 * r["n_pos"] * r["n_neg"])

    # constant-score frame: every pair is a tie -> AUC exactly 0.5
    from exact_spark.registry import REGISTRY
    import re

    sql = REGISTRY["ml_roc_auc"].sql
    # same grid/cum/agg pipeline, driven by a 6-row constant-score input
    const_sql = re.sub(
        r"WITH canon AS \(.*?\),\n\s*fx AS \(\n.*?\n\s*\),",
        "WITH fx AS (SELECT 7 AS v_fx, (i % 2) AS label FROM (SELECT unnest(range(6)) AS i)),",
        sql,
        flags=re.S,
    )
    import duckdb

    got = duckdb.sql(const_sql).fetchall()[0]
    assert got[3] == 0.5


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    from exact_spark.operators.metrics import ml_calibration_bins
    from exact_spark.operators.timeseries import canonical_events

    rows = ml_calibration_bins(spark, sf_dir).collect()
    n_total = canonical_events(spark, sf_dir).count()
    assert sum(r["n"] for r in rows) == n_total  # bins partition, never drop
    assert all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["n_pos"] <= r["n"]


def test_best_threshold_dominates_curve(spark, sf_dir):
    """The selected operating point's F1 must be >= the F1 of every point
    on the registered curve (it IS the argmax)."""
    from exact_spark.operators.metrics import g9_pr_curve, ml_best_threshold

    best = ml_best_threshold(spark, sf_dir).collect()[0]
    for r in g9_pr_curve(spark, sf_dir).collect():
        f1 = (2 * r["tp"]) / (2 * r["tp"] + r["fp"] + r["fn"]) if (2 * r["tp"] + r["fp"] + r["fn"]) else 0.0
        assert best["f1"] >= f1 - 1e-15


def test_referential_integrity_clean_testdata(spark, sf_dir):
    """The generated star schema is referentially intact — every edge
    audits to zero orphans, and each edge's row count matches its fact."""
    from exact_spark import io
    from exact_spark.operators.dq import dq_referential_integrity

    rows = {r["edge"]: r for r in dq_referential_integrity(spark, sf_dir).collect()}
    assert len(rows) == 8
    assert all(r["n_orphans"] == 0 for r in rows.values())
    n_li = io.load(spark, sf_dir, "lineitem").count()
    for e in ("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
              "lineitem.l_suppkey->supplier"):
        assert rows[e]["n_rows"] == n_li


def test_index_manifest_consistency(spark, sf_dir):
    """Stage flags must reproduce their source operators: the number of
    non-lsh-unique vectors equals the distinct vec_b census of the
    registered pair query, and indexed == AND of the stages."""
    from exact_spark.operators.similarity import (
        emb_index_manifest,
        sim_neardup_lsh,
        dedup_semantic,
    )

    rows = emb_index_manifest(spark, sf_dir).collect()
    n_lsh_dropped = sum(1 for r in rows if not r["lsh_unique"])
    n_sem_dropped = sum(1 for r in rows if not r["sem_unique"])
    lsh_b = {r["vec_b"] for r in sim_neardup_lsh(spark, sf_dir).collect()}
    sem_ids = {r["vec_id"] for r in dedup_semantic(spark, sf_dir).collect()}
    assert n_lsh_dropped == len(lsh_b)
    assert n_sem_dropped == len(sem_ids)
    for r in rows:
        assert r["indexed"] == (r["norm_ok"] and r["lsh_unique"] and r["sem_unique"])


def test_dim_stats_variance_nonnegative_and_complete(spark, sf_dir):
    from exact_spark import io
    from exact_spark.operators.similarity import emb_dim_stats

    rows = emb_dim_stats(spark, sf_dir).collect()
    n_vec = io.load(spark, sf_dir, "embeddings").count()
    assert len(rows) == 64
    for r in rows:
        assert r["n_vectors"] == n_vec
        assert r["variance"] >= 0.0
        assert r["min_value"] <= r["mean_value"] <= r["max_value"]


def test_bpe_greedy_merge_run_parity(spark):
    """The one subtle BPE semantic: a run of identical symbols merges
    greedily left-to-right non-overlapping — 'aaaa' under merge (a,a)
    becomes 'aa aa' (2 merges), 'aaaaa' becomes 'aa aa a'. A naive
    string replace would under-merge; the run-parity selection must not."""
    from exact_spark.operators.text import _bpe_iteration

    state = spark.createDataFrame(
        [("aaaa", 1, "a a a a"), ("aaaaa", 1, "a a a a a")],
        "word string, freq long, sym string",
    )
    nxt, rule = _bpe_iteration(state, 1)
    r = rule.collect()[0]
    assert (r["pair_a"], r["pair_b"], r["merged"]) == ("a", "a", "aa")
    # pair census counts ALL adjacent pairs (overlapping): 3 + 4
    assert r["cnt"] == 7
    syms = {row["word"]: row["sym"] for row in nxt.collect()}
    assert syms["aaaa"] == "aa aa"
    assert syms["aaaaa"] == "aa aa a"


def test_bpe_merges_are_reapplied_in_later_iterations(spark, sf_dir):
    """Learned symbols must compound: after merging (e,r), a later
    census sees 'er' as ONE symbol (pairs like ('t','er') become
    possible). Verified on the real corpus output: no later rule can
    re-learn a pair that an earlier merge already fused."""
    from exact_spark.operators.text import text_bpe_merges

    rules = text_bpe_merges(spark, sf_dir).collect()
    assert len(rules) == 3
    seen = set()
    for r in sorted(rules, key=lambda r: r["merge_rank"]):
        assert (r["pair_a"], r["pair_b"]) not in seen
        seen.add((r["pair_a"], r["pair_b"]))
        assert r["merged"] == r["pair_a"] + r["pair_b"]
        assert r["cnt"] > 0


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark, tmp_path):
    """The MOSS winnowing guarantee: any shared run of w + k - 1 = 6
    consecutive tokens contains one complete window of k-gram positions,
    and the min of an identical hash multiset is identical — so the two
    docs MUST share at least one selected fingerprint, wherever the run
    sits and whatever surrounds it."""
    import pandas as pd

    from exact_spark.operators.text import _winnow_selected

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token planted run
    rows = [
        (1, f"one two three four five six seven {shared} tail1 tail2 tail3"),
        (2, f"{shared} completely different suffix tokens here nine ten eleven"),
        (3, "no planted run at all just unrelated filler words going on and on"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    sel = _winnow_selected(spark, str(tmp_path)).toPandas()
    fp1 = set(sel[sel.doc_id == 1].fp)
    fp2 = set(sel[sel.doc_id == 2].fp)
    fp3 = set(sel[sel.doc_id == 3].fp)
    assert fp1 & fp2, "shared 6-token run must yield a shared fingerprint"
    assert not (fp1 & fp3) and not (fp2 & fp3)  # unrelated doc stays disjoint
