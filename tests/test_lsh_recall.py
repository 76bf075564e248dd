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
