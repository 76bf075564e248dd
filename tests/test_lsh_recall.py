"""dedup_lsh_recall + text_tokenize_ids composition contracts."""

from __future__ import annotations

from exact_spark.operators.dedup import (
    dedup_lsh_recall,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from exact_spark.operators.text import _VOCAB_K, text_tokenize_ids


def test_recall_counts_tie_to_siblings(spark, sf_dir):
    got = dedup_lsh_recall(spark, sf_dir).toPandas()
    truth_n = dedup_ngram_jaccard(spark, sf_dir).count()
    assert got.n_true.sum() == truth_n  # every truth pair lands in a band
    assert (got.n_cand_hit <= got.n_true).all()
    assert got.recall.between(0.0, 1.0).all()
    # hits must actually be LSH candidates: total hits <= candidate count
    assert got.n_cand_hit.sum() <= dedup_minhash_lsh(spark, sf_dir).count()
    # the S-curve property on this corpus: the highest-jaccard band is not
    # worse than the lowest (monotone-ish recall in similarity)
    bands = got.sort_values("jac_band")
    assert bands.recall.iloc[-1] >= bands.recall.iloc[0]


def test_tokenize_ids_contracts(spark, sf_dir):
    got = text_tokenize_ids(spark, sf_dir).toPandas()
    assert (got.n_oov <= got.n_tokens).all()
    assert ((got.oov_rate >= 0) & (got.oov_rate <= 1)).all()
    # checksum is over the ordered id stream: deterministic across runs
    again = text_tokenize_ids(spark, sf_dir).toPandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # vocabulary covers the corpus head: OOV should be a minority overall
    assert got.n_oov.sum() < got.n_tokens.sum()
    assert _VOCAB_K == 200  # oracle SQL inlines the same constant


def test_quantile_rollup_bounds_and_merge(spark, sf_dir):
    """sketch_quantile_rollup: every bracket must contain the exact
    quantile (the one-bin-width error bound), and the day-merged estimate
    must equal a direct unpartitioned histogram's estimate (mergeability
    — the reason this exists next to approx_percentile)."""
    from pyspark.sql import functions as F
    from exact_spark.operators.metrics import (
        _QSK_BINS,
        sketch_quantile_rollup,
    )
    from exact_spark.operators.timeseries import canonical_events

    got = sketch_quantile_rollup(spark, sf_dir).toPandas()
    assert len(got) == 3
    assert got.within_bound.all()
    assert ((got.est_hi - got.est_lo) > 0).all()
    # direct (no daily split) histogram must land on the same brackets
    df = canonical_events(spark, sf_dir).select("value")
    b = df.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    import numpy as np
    vals = np.array([r["value"] for r in df.collect()])
    bins = np.minimum(
        _QSK_BINS - 1,
        np.floor((vals - b["lo"]) / (b["hi"] - b["lo"]) * _QSK_BINS),
    ).astype(int)
    counts = np.bincount(bins, minlength=_QSK_BINS)
    cum = counts.cumsum()
    for _, row in got.iterrows():
        qbin = int(np.searchsorted(cum, np.ceil(row.q * len(vals))))
        direct_lo = b["lo"] + qbin * (b["hi"] - b["lo"]) / _QSK_BINS
        assert abs(direct_lo - row.est_lo) < 1e-9
