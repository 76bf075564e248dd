"""Edge-case behavior of the round-4 curation/TS operators on constructed
degenerate inputs (empty batches, constant series, spikes)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exact_spark.operators.dedup import dedup_incremental
from exact_spark.operators.text import (
    _PACK_BUDGET,
    text_pack_sequences,
    text_shard_assign,
)


def _write_docs(tmp_path_factory, docs):
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    out = tmp_path_factory.mktemp("edge_docs")
    pq.write_table(tbl, out / "documents.parquet")
    return str(out)


def test_incremental_dedup_no_batch_docs(spark, tmp_path_factory):
    """A corpus whose md5 split yields an empty arriving batch returns an
    empty verdict frame, not an error (md5('4') starts 'a' — outside the
    c-f batch split)."""
    d = _write_docs(tmp_path_factory, [(4, "alpha beta gamma")])
    got = dedup_incremental(spark, d).toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "verdict", "dup_of"]


def test_pack_sequences_skips_empty_docs(spark, tmp_path_factory):
    """Zero-token documents are excluded; the stream stays contiguous
    across the gap they leave in doc_id space."""
    d = _write_docs(
        tmp_path_factory,
        [(0, "one two three"), (1, "...!!!"), (2, "four five six seven")],
    )
    got = text_pack_sequences(spark, d).toPandas().sort_values("doc_id")
    assert list(got.doc_id) == [0, 2]
    assert got.iloc[0].start_offset == 0
    # doc 2 starts exactly where doc 0 ended: token 3
    assert got.iloc[1].start_pack * _PACK_BUDGET + got.iloc[1].start_offset == 3


def test_shard_assign_conserves_single_doc(spark, tmp_path_factory):
    d = _write_docs(tmp_path_factory, [(7, "a b c")])
    got = text_shard_assign(spark, d).toPandas()
    assert len(got) == 1 and got.n_docs.iloc[0] == 1 and got.total_tokens.iloc[0] == 3


@pytest.fixture(scope="module")
def ewma_events_dir(tmp_path_factory):
    """events.parquet: user 0 constant series; user 1 one large spike.
    Timestamps as TIMESTAMP(us) parquet (DuckDB-compatible)."""
    n = 60
    rows = []
    eid = 0
    for uid, vals in ((0, [5.0] * n), (1, [5.0] * n)):
        v = list(vals)
        if uid == 1:
            v[40] = 50.0
        for i, x in enumerate(v):
            rows.append((eid, 1_700_000_000_000_000 + i * 60_000_000, uid, "view", x))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int32()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    out = tmp_path_factory.mktemp("ewma_events")
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


def test_ewma_band_constant_vs_spike(spark, ewma_events_dir):
    from exact_spark.operators.timeseries import ts_ewma_band

    got = ts_ewma_band(spark, ewma_events_dir).toPandas().set_index("user_id")
    # constant series: zero residual everywhere -> nothing flagged
    assert got.loc[0, "n_flagged"] == 0
    # spiked series: the spike dominates sigma, at least one flag
    assert got.loc[1, "n_flagged"] >= 1


@pytest.fixture(scope="module")
def big_flat_events_dir(tmp_path_factory):
    """A LARGE-magnitude constant series (~1e8, e.g. byte counters): the
    renormalization FP noise scales with the level, so an absolute floor
    would flag every row — the relative floor must not."""
    rows = []
    for i in range(60):
        rows.append((i, 1_700_000_000_000_000 + i * 60_000_000, 0, "view", 1.23456789e8))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int32()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    out = tmp_path_factory.mktemp("big_flat_events")
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


def test_ewma_band_flat_large_magnitude(spark, big_flat_events_dir):
    from exact_spark.operators.timeseries import ts_ewma_band

    got = ts_ewma_band(spark, big_flat_events_dir).toPandas()
    assert got.n_flagged.iloc[0] == 0


def test_lm_score_flags_garbled_document(spark, tmp_path_factory):
    """The bigram LM must rank an out-of-distribution garbled document
    below corpus-typical ones: its transitions are unseen, so Laplace
    mass dominates and surprising-transition counts spike."""
    from exact_spark.operators.text import text_lm_score

    normal = "the quick brown fox jumps over the lazy dog near the old barn"
    docs = [(i, normal) for i in range(10)]
    docs.append((10, "zq xv qj vk wz jx kq zx vq xw"))  # garbled
    d = _write_docs(tmp_path_factory, docs)
    got = text_lm_score(spark, d).toPandas().set_index("doc_id")
    # strictly the worst fluency in the corpus (the n_surprising floor is
    # sized for corpus-scale vocabularies; on a 21-token toy corpus the
    # Laplace mass keeps every p above it, so the ORDERING is the test)
    assert got.loc[10, "avg_transition_p"] == got.avg_transition_p.min()
    assert (got.drop(10).avg_transition_p > got.loc[10, "avg_transition_p"] * 2).all()


def test_cms_never_underestimates_under_zipf_skew(spark, tmp_path_factory):
    """A Zipf-extreme corpus (one token = half of all mass) must not
    break the count-min overestimate invariant — the hot token's cells
    absorb collisions but min-over-rows still covers the truth."""
    from exact_spark.operators.text import sketch_heavy_hitters

    hot = ("hot " * 200).strip()
    docs = [(i, hot) for i in range(5)]
    docs += [(100 + i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(50)]
    d = _write_docs(tmp_path_factory, docs)
    got = sketch_heavy_hitters(spark, d).toPandas()
    assert got.never_underestimates.all()
    top = got.sort_values("true_count", ascending=False).iloc[0]
    assert top.tok == "hot" and top.true_count == 1000
    assert top.cms_estimate >= 1000


def test_drift_bins_mass_and_conservation(spark, sf_dir):
    """Drift bins: probability masses each sum to 1, every bin row carries a
    non-negative bounded term, and the two split sizes re-add to the corpus
    (the positional 85/15 contract)."""
    from pyspark.sql import functions as F

    from exact_spark.operators.metrics import ml_drift_bins
    from exact_spark.operators.timeseries import canonical_events

    res = ml_drift_bins(spark, sf_dir)
    agg = res.agg(
        F.sum("p_train").alias("pt"),
        F.sum("p_test").alias("pe"),
        F.sum("n_train").alias("nt"),
        F.sum("n_test").alias("ne"),
        F.min("drift_term").alias("mn"),
        F.max("drift_term").alias("mx"),
    ).collect()[0]
    assert abs(agg["pt"] - 1.0) < 1e-9 and abs(agg["pe"] - 1.0) < 1e-9
    assert agg["mn"] >= 0.0 and agg["mx"] <= 2.0  # triangular discrimination bound
    n_total = canonical_events(spark, sf_dir).count()
    assert agg["nt"] + agg["ne"] == n_total


def _write_sourced_docs(tmp_path_factory, docs):
    """docs: list of (doc_id, text, source)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([d[2] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    out = tmp_path_factory.mktemp("edge_rel_docs")
    pq.write_table(tbl, out / "documents.parquet")
    return str(out)


def test_decontaminate_scrub_without_eval_source(spark, tmp_path_factory):
    """A corpus with NO eval-source docs has an empty contamination-span
    table: every training doc passes through verbatim with zero removal
    (the COALESCE fallbacks, not an error)."""
    from exact_spark.operators.dedup import _SUB_L, decontaminate_scrub

    long_a = "alpha bravo charlie delta " * 4  # > _SUB_L chars
    assert len(long_a) >= _SUB_L
    d = _write_sourced_docs(
        tmp_path_factory, [(100, long_a, "src7"), (101, "tiny", "src8")]
    )
    got = decontaminate_scrub(spark, d).toPandas().set_index("doc_id")
    assert set(got.index) == {100, 101}
    assert (got.n_spans == 0).all() and (got.removed_chars == 0).all()
    assert got.loc[100, "clean_text"] == long_a
    assert got.loc[101, "clean_text"] == "tiny"


def test_release_layer_on_all_holdout_corpus(spark, tmp_path_factory):
    """A corpus whose doc_ids all sit below the eval-holdout line ships
    NOTHING — the whole composed release stack (manifest, funnel,
    attribution, dataset, tokens) must degrade gracefully: ship all
    false, drop_stage 'eval_holdout' everywhere, shipped stages zero,
    empty dataset and token table (the token-share zero guard means no
    NaN/NULL divergence anywhere)."""
    from exact_spark.operators.dedup import (
        _EVAL_N,
        corpus_release_attribution,
        corpus_release_dataset,
        corpus_release_funnel,
        corpus_release_manifest,
        corpus_release_tokens,
    )

    docs = [
        (i, f"document number {i} with words " + "filler " * i, f"src{i % 2 + 1}")
        for i in range(4)
    ]
    assert all(i < _EVAL_N for i, _, _ in docs)
    d = _write_sourced_docs(tmp_path_factory, docs)

    man = corpus_release_manifest(spark, d).toPandas()
    assert len(man) == 4 and not man.ship.any() and not man.in_pool.any()
    assert (man.drop_stage == "eval_holdout").all()

    fun = corpus_release_funnel(spark, d).toPandas().set_index("stage")
    assert fun.loc["raw", "n_docs"] == 4
    assert fun.loc["eval_holdout", "n_docs"] == 0  # survivors PAST holdout
    assert fun.loc["shipped_scrubbed", "n_docs"] == 0
    assert fun.loc["shipped_scrubbed", "n_chars"] == 0

    att = corpus_release_attribution(spark, d).toPandas().set_index("source")
    assert att.n_docs.sum() == 4
    assert (att.n_eval_holdout == att.n_docs).all()
    assert (att.n_shipped == 0).all() and (att.ship_rate == 0.0).all()
    assert (att.shipped_chars == 0).all()

    assert corpus_release_dataset(spark, d).count() == 0
    assert corpus_release_tokens(spark, d).count() == 0


def test_survivor_policy_on_dup_free_corpus(spark, tmp_path_factory):
    """A corpus with no duplicate pairs has NO components: the policy
    table is empty and the census degrades to zeros with a NULL changed
    fraction (never 0/0) — the degenerate-input contract."""
    from exact_spark.operators.dedup import (
        dedup_survivor_policy,
        dedup_survivor_policy_census,
    )

    words = [
        "apple banana cherry damson elder fig grape haw ivy jujube",
        "kale lemon mango nutmeg olive peach quince radish sage thyme",
        "ugli vanilla walnut xigua yam zucchini basil chive dill endive",
        "fennel ginger horseradish iceberg jalapeno kohlrabi leek mint",
    ]
    docs = [
        (100 + i, (w + " ") * 8, "srcA") for i, w in enumerate(words)
    ]
    d = _write_sourced_docs(tmp_path_factory, docs)
    assert dedup_survivor_policy(spark, d).count() == 0
    c = dedup_survivor_policy_census(spark, d).toPandas().iloc[0]
    assert c.n_components == 0 and c.n_changed == 0
    assert c.chars_min_id_total == 0 and c.chars_policy_total == 0
    assert c.chars_delta_total == 0
    import pandas as pd

    assert pd.isna(c.frac_changed)


def test_benchmark_attribution_without_eval_source(spark, tmp_path_factory):
    """No eval-source docs -> no benchmarks: the per-benchmark table is
    EMPTY (the census drives the output), not an error."""
    from exact_spark.operators.dedup import decontaminate_by_benchmark

    long_a = "golf hotel india juliet kilo lima " * 3
    d = _write_sourced_docs(
        tmp_path_factory, [(100, long_a, "src7"), (101, long_a, "src8")]
    )
    assert decontaminate_by_benchmark(spark, d).count() == 0


def test_r11_release_reads_on_all_holdout_corpus(spark, tmp_path_factory):
    """The r11 release reads degrade like their r10 siblings on a corpus
    that ships nothing: packed is empty, the policy delta shows zero
    shipping under BOTH keeper policies, and the card's one row carries
    zero shipped mass with a 0.0 ship rate."""
    from exact_spark.operators.dedup import (
        _EVAL_N,
        corpus_release_card,
        corpus_release_packed,
        corpus_release_policy_delta,
    )

    docs = [
        (i, f"holdout document number {i} with words " + "pad " * (20 + i), f"src{i % 2 + 1}")
        for i in range(4)
    ]
    assert all(i < _EVAL_N for i, _, _ in docs)
    d = _write_sourced_docs(tmp_path_factory, docs)

    assert corpus_release_packed(spark, d).count() == 0

    delta = corpus_release_policy_delta(spark, d).toPandas()
    assert delta.n_ship_min_id.sum() == 0 and delta.n_ship_policy.sum() == 0
    assert delta.n_enter.sum() == 0 and delta.n_leave.sum() == 0
    assert delta.chars_min_id.sum() == 0 and delta.chars_policy.sum() == 0

    card = corpus_release_card(spark, d).toPandas().iloc[0]
    assert card.n_docs_raw == 4 and card.n_docs_shipped == 0
    assert card.ship_rate == 0.0
    assert card.n_sources_shipped == 0
    assert card.chars_shipped == 0 and card.tokens_shipped == 0
    assert card.chars_excised == 0
