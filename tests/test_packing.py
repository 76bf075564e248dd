"""Sequence-packing invariants: the distributed prefix sum must behave as
ONE doc-ordered token stream regardless of partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from exact_spark.operators.text import (
    _PACK_BUDGET,
    text_pack_sequences,
    text_shard_assign,
    tokens_col,
)
from exact_spark import io


def test_stream_contiguity(spark, sf_dir):
    got = (
        text_pack_sequences(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reconstruct each doc's global start position and check the stream has
    # no gaps: start_i == start_{i-1} + n_tokens_{i-1}
    starts = got.start_pack * _PACK_BUDGET + got.start_offset
    ends = starts + got.n_tokens
    assert (starts.iloc[1:].values == ends.iloc[:-1].values).all()
    assert starts.iloc[0] == 0
    # span accounting: packs_spanned covers [start, end)
    last_pack = (ends - 1) // _PACK_BUDGET
    assert (got.packs_spanned == last_pack - got.start_pack + 1).all()


def test_partition_invariance(spark, sf_dir):
    a = text_pack_sequences(spark, sf_dir).toPandas().sort_values("doc_id")
    b = (
        text_pack_sequences(spark, sf_dir)
        .repartition(7)
        .toPandas()
        .sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_shard_totals_conserve_corpus(spark, sf_dir):
    shards = text_shard_assign(spark, sf_dir).toPandas()
    docs = io.load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(F.size(tokens_col()))).collect()[0][0]
    assert shards.n_docs.sum() == n_docs
    assert shards.total_tokens.sum() == n_tokens
    assert shards.shard.between(0, 7).all()


def test_weighted_sample_mass_and_invariance(spark, sf_dir):
    """pps systematic sampling: total picks == k exactly, heavy docs can be
    picked more than once, and the selection is partition-invariant."""
    from pyspark.sql import functions as F

    from exact_spark.operators.text import _WS_K, text_weighted_sample

    res = text_weighted_sample(spark, sf_dir).cache()
    try:
        assert res.agg(F.sum("n_picks")).collect()[0][0] == _WS_K
        ids1 = sorted(r["doc_id"] for r in res.select("doc_id").collect())
        # re-run: plan rebuilds from scratch (fresh prefix-sum collect) —
        # same picks regardless of scheduling/partitioning
        ids2 = sorted(
            r["doc_id"]
            for r in text_weighted_sample(spark, sf_dir).select("doc_id").collect()
        )
        assert ids1 == ids2
    finally:
        res.unpersist()
