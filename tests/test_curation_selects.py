"""Semantic property tests for the corpus-selection operators:
leakage-safe split, temperature mixing, token-budget selection.

Each operator's oracle-hash parity is covered by the registry gate
(tests/test_oracle_parity.py); these tests pin the CONTRACT the hash
can't express — the invariants a user relies on when pointing the
operator at a different corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exact_spark.operators.dedup import (
    _SPLIT_TEST_LT,
    _SPLIT_VAL_LT,
    dedup_components,
    dedup_leakage_safe_split,
)
from exact_spark.operators.text import (
    _TBUDGET_TOKENS,
    _TMIX_BUDGET,
    text_temperature_mix,
    text_token_budget_select,
)
from tests.conftest import SF_DIR


class TestLeakageSafeSplit:
    def test_covers_every_document_once(self, spark):
        out = dedup_leakage_safe_split(spark, SF_DIR)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()

    def test_duplicate_group_never_straddles_splits(self, spark):
        """The operator's whole point: every member of a duplicate
        component gets the SAME split."""
        out = dedup_leakage_safe_split(spark, SF_DIR)
        straddlers = (
            out.groupBy("group_root")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
        )
        assert straddlers.count() == 0

    def test_group_root_matches_components(self, spark):
        comp = dedup_components(spark, SF_DIR)
        out = dedup_leakage_safe_split(spark, SF_DIR)
        joined = out.join(comp, "doc_id", "inner")
        mismatches = joined.filter(F.col("group_root") != F.col("component_id"))
        assert mismatches.count() == 0

    def test_split_rates_near_design(self, spark):
        """10/10/80 out of 256 buckets — allow generous tolerance at this
        corpus size, but all three splits must be populated and ordered."""
        rows = (
            dedup_leakage_safe_split(spark, SF_DIR)
            .groupBy("split")
            .count()
            .collect()
        )
        counts = {r["split"]: r["count"] for r in rows}
        total = sum(counts.values())
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"]
        assert counts["train"] > counts["test"]
        assert counts["train"] / total > 0.6
        # design rates: test ~ 26/256, val ~ 25/256
        assert _SPLIT_TEST_LT < _SPLIT_VAL_LT


class TestTemperatureMix:
    def test_budget_and_per_lang_targets(self, spark):
        out = text_temperature_mix(spark, SF_DIR).cache()
        # per-language draw honors its own integer target exactly
        per = out.groupBy("lang", "k_target").count().collect()
        for r in per:
            assert r["count"] == r["k_target"]
        # floor in each language keeps the total at-or-under budget, and
        # within one doc per language of it
        total = out.count()
        n_langs = len(per)
        assert total <= _TMIX_BUDGET
        assert total >= _TMIX_BUDGET - n_langs
        out.unpersist()

    def test_flattens_language_skew(self, spark):
        """alpha=0.5 must UP-weight low-resource languages: the selected
        share of every minority language exceeds its natural share."""
        out = text_temperature_mix(spark, SF_DIR)
        rows = out.select("lang", "n_group", "k_target").distinct().collect()
        tot_docs = sum(r["n_group"] for r in rows)
        tot_sel = sum(r["k_target"] for r in rows)
        head = max(rows, key=lambda r: r["n_group"])
        for r in rows:
            nat = r["n_group"] / tot_docs
            sel = r["k_target"] / tot_sel
            if r["lang"] == head["lang"]:
                assert sel < nat  # head language is DOWN-weighted
            elif nat < 0.15:
                assert sel > nat  # minority languages are UP-weighted


class TestTokenBudgetSelect:
    def test_budget_respected_per_source(self, spark):
        out = text_token_budget_select(spark, SF_DIR)
        over = out.groupBy("source").agg(F.max("cum_tokens").alias("m")).filter(
            F.col("m") > _TBUDGET_TOKENS
        )
        assert over.count() == 0

    def test_selection_is_quality_prefix(self, spark):
        """Selected rows form a rank prefix per source: ranks are exactly
        1..k with no holes — nothing skipped, nothing out of order."""
        out = text_token_budget_select(spark, SF_DIR)
        agg = out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("rk").alias("max_rk"),
            F.min("rk").alias("min_rk"),
        )
        broken = agg.filter(
            (F.col("max_rk") != F.col("n")) | (F.col("min_rk") != 1)
        )
        assert broken.count() == 0

    def test_greedy_cut_is_tight(self, spark):
        """The next-ranked document per source would NOT have fit — the
        prefix is maximal, not merely feasible."""
        out = text_token_budget_select(spark, SF_DIR)
        from exact_spark.operators.text import _text_profile_frame
        from exact_spark import io

        prof = _text_profile_frame(spark, SF_DIR).select(
            "doc_id", "n_tokens", "quality_score"
        )
        docs = io.load(spark, SF_DIR, "documents").select("doc_id", "source")
        from pyspark.sql.window import Window

        w = Window.partitionBy("source").orderBy(
            F.col("quality_score").desc(), F.col("doc_id").asc()
        )
        full = prof.join(docs, "doc_id").select(
            "source",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("n_tokens")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_tokens"),
        )
        kept = out.groupBy("source").agg(F.max("rk").alias("k"))
        nxt = full.join(kept, "source").filter(F.col("rk") == F.col("k") + 1)
        # every existing next-rank row must overflow the budget
        fits = nxt.filter(F.col("cum_tokens") <= _TBUDGET_TOKENS)
        assert fits.count() == 0


class TestNoveltyCurve:
    def test_first_batch_maximal_and_rates_bounded(self, spark):
        from exact_spark.operators.dedup import text_novelty_curve

        rows = text_novelty_curve(spark, SF_DIR).collect()
        by_batch = sorted(rows, key=lambda r: r["batch"])
        rates = [r["novelty_rate"] for r in by_batch]
        assert all(0.0 < x <= 1.0 for x in rates)
        # the first batch has no history, so it is the novelty maximum
        assert rates[0] == max(rates)
        # saturation: the curve's back half is on average less novel than
        # the front half
        mid = len(rates) // 2
        assert sum(rates[mid:]) / (len(rates) - mid) < sum(rates[:mid]) / mid

    def test_novel_mass_equals_distinct_shingles(self, spark):
        """Every distinct shingle is attributed to exactly ONE batch: the
        novel counts sum to the corpus' distinct shingle count."""
        from exact_spark.operators.dedup import _shingled, text_novelty_curve

        out = text_novelty_curve(spark, SF_DIR)
        total_novel = out.agg(F.sum("novel_shingles")).collect()[0][0]
        distinct_sh = (
            _shingled(spark, SF_DIR)
            .select(F.explode("shingles").alias("sh"))
            .distinct()
            .count()
        )
        assert total_novel == distinct_sh
