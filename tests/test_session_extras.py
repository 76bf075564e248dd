"""Property tests for the continuation-session operators: invariants the
oracle hash cannot express (monotonicity, reconstruction, boundedness)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from exact_spark.registry import REGISTRY, _load_all

_load_all()


def test_ab_welch_cohorts_partition_users(spark, sf_dir):
    row = REGISTRY["ml_ab_welch"].fn(spark, sf_dir).collect()[0]
    from exact_spark.operators.timeseries import canonical_events

    n_users = canonical_events(spark, sf_dir).select("user_id").distinct().count()
    assert row["n_a"] + row["n_b"] == n_users
    # both cohorts non-degenerate, variances positive, t finite
    assert row["n_a"] > 1 and row["n_b"] > 1
    assert row["var_a"] > 0 and row["var_b"] > 0
    assert math.isfinite(row["t_stat"])


def test_pareto_abc_cum_share_monotone_and_exhaustive(spark, sf_dir):
    rows = sorted(
        REGISTRY["rel_pareto_abc"].fn(spark, sf_dir).collect(), key=lambda r: r["rnk"]
    )
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12
    # class sequence is a prefix of A* B* C* (never interleaved)
    classes = "".join(r["abc_class"] for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count("B") + "C" * classes.count("C")
    # revenue is non-increasing in rank (ties broken by suppkey)
    revs = [r["revenue"] for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))


def test_random_projection_fidelity_bounded(spark, sf_dir):
    df = REGISTRY["emb_random_projection"].fn(spark, sf_dir)
    rows = df.collect()
    n = 20
    assert len(rows) == n * (n - 1) // 2
    # JL with 16 sign planes: per-pair distortion ~ N(0, 1/sqrt(16));
    # a sign/indexing bug pushes abs_err toward its trivial max of 2
    assert max(r["abs_err"] for r in rows) < 1.0
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.3
    for r in rows[:5]:
        assert -1.0000001 <= r["cos_proj"] <= 1.0000001


def test_holt_linear_recurrence_invariants(spark, sf_dir):
    rows = REGISTRY["ts_holt_linear"].fn(spark, sf_dir).collect()
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    assert by_series
    for _, series in by_series.items():
        series.sort(key=lambda r: r["rn"])
        # rn contiguous from 1, hours strictly increasing
        assert [r["rn"] for r in series] == list(range(1, len(series) + 1))
        hours = [r["hour"] for r in series]
        assert all(b > a for a, b in zip(hours, hours[1:]))
        # seed: level = first observation, trend = 0
        assert series[0]["level"] == series[0]["y_mean"]
        assert series[0]["trend"] == 0.0
        # recurrence replay: alpha = gamma = 1/2 in the same op order.
        # y must be rebuilt as the INTEGER fx value (y_mean * 100.0 is a
        # lossy double round-trip and would drift the replay).
        l, b = float(round(series[0]["y_mean"] * 100.0)), 0.0
        assert series[0]["forecast_next"] == (l + b) / 100.0
        for r in series[1:]:
            y = float(round(r["y_mean"] * 100.0))
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
            assert r["level"] == l / 100.0
            assert r["trend"] == b / 100.0
            assert r["forecast_next"] == (l + b) / 100.0


def test_mmr_scores_non_increasing_and_distinct(spark, sf_dir):
    rows = REGISTRY["sim_mmr_select"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 10
    for _, sel in by_q.items():
        sel.sort(key=lambda r: r["step"])
        assert [r["step"] for r in sel] == [1, 2, 3, 4, 5]
        ids = [r["selected_id"] for r in sel]
        assert len(set(ids)) == len(ids)
        # greedy MMR scores are non-increasing FROM STEP 2 ON: the step-t
        # winner was available at step t-1 with a score no lower than it
        # has now (max-over-selected grows with the set). Step 1 -> 2 can
        # legitimately increase when pool cosines are negative (step 1's
        # implicit max-sim is 0, step 2's can be < 0).
        scores = [r["mmr_score"] for r in sel[1:]]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:]))
        # step 1 is the pure-relevance argmax
        assert sel[0]["mmr_score"] == 0.5 * sel[0]["relevance"]
        assert sel[0]["relevance"] == max(r["relevance"] for r in sel)


def test_chunk_scrub_reconstruction_arithmetic(spark, sf_dir):
    from exact_spark.operators.dedup import _CHUNK_TOKENS
    from exact_spark.operators.text import tokens_col
    from exact_spark import io

    scrub = REGISTRY["text_chunk_scrub"].fn(spark, sf_dir)
    docs = io.load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_col()).alias("n_toks")
    )
    j = scrub.join(docs, "doc_id").select(
        "doc_id",
        "n_chunks",
        "n_removed",
        "n_toks",
        F.size(F.split(F.col("clean_text"), " ")).alias("n_clean"),
        (F.col("clean_text") == "").alias("empty"),
    )
    for r in j.collect():
        assert 0 <= r["n_removed"] <= r["n_chunks"]
        assert r["n_chunks"] == r["n_toks"] // _CHUNK_TOKENS
        expect = r["n_toks"] - r["n_removed"] * _CHUNK_TOKENS
        got = 0 if r["empty"] else r["n_clean"]
        assert got == expect, (r["doc_id"], got, expect)


def test_residual_outliers_composes_decompose(spark, sf_dir):
    rows = REGISTRY["ts_residual_outliers"].fn(spark, sf_dir).collect()
    dec = REGISTRY["ts_classical_decompose"].fn(spark, sf_dir)
    hours = {
        r["event_type"]: r["n"] for r in
        dec.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["event_type"] for r in rows} == set(hours)
    for r in rows:
        assert r["n_hours"] == hours[r["event_type"]]
        assert r["mad_residual"] >= 0
        assert 0 <= r["n_outlier_hours"] < r["n_hours"]


def test_hamming_codes_pack_every_dimension(spark, sf_dir):
    rows = REGISTRY["emb_hamming_topk"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 10
    for _, lst in by_q.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == [1, 2, 3, 4, 5]
        hams = [r["hamming"] for r in lst]
        assert all(0 <= h <= 64 for h in hams)
        assert hams == sorted(hams)
    # recall against exact cosine must beat random pairing: expected
    # random overlap of two 5-sets in ~500 candidates is ~0.05
    rec = REGISTRY["emb_hamming_recall"].fn(spark, sf_dir).collect()
    assert len(rec) == 10
    mean_rec = sum(r["recall_at_k"] for r in rec) / len(rec)
    assert 0.0 <= mean_rec <= 1.0
    assert mean_rec > 0.1, mean_rec


def test_diversity_gain_mmr_no_more_redundant(spark, sf_dir):
    rows = REGISTRY["sim_diversity_gain"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    # MMR explicitly penalizes intra-set similarity; on average its set
    # must not be MORE redundant than the pure-relevance set
    mean_gain = sum(r["diversity_gain"] for r in rows) / len(rows)
    assert mean_gain > -1e-9, mean_gain
    for r in rows:
        assert -1.0 <= r["mean_pairsim_mmr"] <= 1.0
        assert -1.0 <= r["mean_pairsim_topk"] <= 1.0


def test_rate_shift_halves_partition_events(spark, sf_dir):
    rows = REGISTRY["ts_rate_shift"].fn(spark, sf_dir).collect()
    from exact_spark.operators.timeseries import canonical_events

    per_type = {
        r["event_type"]: r["n"] for r in
        canonical_events(spark, sf_dir)
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["event_type"] for r in rows} == set(per_type)
    for r in rows:
        assert r["n_a"] + r["n_b"] == per_type[r["event_type"]]
        assert r["hours_a"] > 0 and r["hours_b"] > 0
        # grid exposures differ by at most one hour between the halves
        assert abs(r["hours_a"] - r["hours_b"]) <= 1
        assert r["rate_a"] == r["n_a"] / r["hours_a"]


def test_peaks_are_strict_local_maxima(spark, sf_dir):
    from exact_spark.operators.timeseries import _PEAK_HALF_WIN, ts_peaks

    peaks = REGISTRY["ts_peaks"].fn(spark, sf_dir).collect()
    assert peaks
    # rebuild the hourly series and check each reported peak dominates
    # its +/-win neighborhood strictly
    from exact_spark.operators.timeseries import canonical_events

    df = canonical_events(spark, sf_dir)
    cells = (
        df.select(
            "event_type",
            F.floor(F.col("ts_epoch") / 3600.0).cast("long").alias("hour"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("v"),
        )
        .groupBy("event_type", "hour")
        .agg(F.floor(F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
             .cast("long").alias("m"))
    ).collect()
    series: dict[str, dict[int, int]] = {}
    for r in cells:
        series.setdefault(r["event_type"], {})[r["hour"]] = r["m"]
    for p in peaks:
        s = series[p["event_type"]]
        h = p["hour"]
        me = s[h]
        neigh = [
            s[h + d]
            for d in range(-_PEAK_HALF_WIN, _PEAK_HALF_WIN + 1)
            if d != 0 and (h + d) in s
        ]
        assert neigh, "isolated hour must not be a peak"
        assert all(me > v for v in neigh)
        assert p["excess"] >= 0


def test_jaccard_sweep_monotone_and_anchored(spark, sf_dir):
    rows = sorted(
        REGISTRY["text_jaccard_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r["tau"],
    )
    assert [round(r["tau"], 1) for r in rows] == [x / 10 for x in range(1, 10)]
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_affected"] for r in rows]
    # raising the cutoff can only shrink the surviving set
    assert all(a >= b for a, b in zip(pairs, pairs[1:]))
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    # tau = the registered candidate floor keeps EVERY candidate pair
    n_all = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).count()
    assert pairs[0] == n_all
