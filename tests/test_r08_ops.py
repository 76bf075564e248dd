"""r08 operator contracts: composed IVF+PQ, perceptual-hash near-dup,
cross-corpus fingerprint contamination, URL canonical dedup.

Oracle parity at both gate SFs is covered by test_oracle_parity.py /
record_correctness; these pin the BEHAVIORAL contracts the hash compare
can't express (exactness vs brute force, recall composition, invariants).
"""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR_MID


# --- composed IVF+PQ ---------------------------------------------------------


def test_ivfpq_candidates_come_from_probed_cells_only(spark, sf_dir):
    """Every returned neighbor must live in one of its query's probed cells —
    the routing half of the composition really constrains the scan (a bug
    that ADC-scans the whole code table would still 'look right')."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from exact_spark import io
    from exact_spark.operators.similarity import (
        _N_CELLS,
        _N_PROBE,
        _N_QUERIES,
        cosine_from_fixed,
        dot_fixed,
        sim_topk_ivfpq,
    )

    got = sim_topk_ivfpq(spark, sf_dir).toPandas()
    emb = io.load(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id",
        "embedding",
        dot_fixed(F.col("embedding"), F.col("embedding")).alias("norm_fx"),
    )
    cent = norms.filter(F.col("vec_id") < _N_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("c_embedding"),
        F.col("norm_fx").alias("c_norm_fx"),
    )
    cos = cosine_from_fixed(
        dot_fixed(F.col("embedding"), F.col("c_embedding")),
        F.col("norm_fx"),
        F.col("c_norm_fx"),
    )
    w = Window.partitionBy("vec_id").orderBy(cos.desc(), F.col("cell"))
    ranked = norms.crossJoin(F.broadcast(cent)).withColumn(
        "r", F.row_number().over(w)
    )
    assigned = {
        r["vec_id"]: r["cell"]
        for r in ranked.filter(F.col("r") == 1).select("vec_id", "cell").collect()
    }
    probes = {
        q: set()
        for q in range(_N_QUERIES)
    }
    for r in (
        ranked.filter((F.col("r") <= _N_PROBE) & (F.col("vec_id") < _N_QUERIES))
        .select("vec_id", "cell")
        .collect()
    ):
        probes[r["vec_id"]].add(r["cell"])
    for _, row in got.iterrows():
        assert assigned[row.neighbor_id] in probes[row.query_id], (
            f"neighbor {row.neighbor_id} (cell {assigned[row.neighbor_id]}) "
            f"outside query {row.query_id}'s probes {probes[row.query_id]}"
        )


def test_ivfpq_shape_and_determinism(spark, sf_dir):
    from exact_spark.operators.similarity import sim_topk_ivfpq

    a = sim_topk_ivfpq(spark, sf_dir).toPandas().sort_values(["query_id", "rank"])
    b = sim_topk_ivfpq(spark, sf_dir).toPandas().sort_values(["query_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert set(a.groupby("query_id")["rank"].max()) == {5}
    assert (a.query_id != a.neighbor_id).all()


def test_ivfpq_recall_bounded_and_nonzero(spark, sf_dir):
    """The compound index still finds true neighbors (recall > 0) and the
    recall column is a correct ratio of hits — the diagnostic's own math."""
    from exact_spark.operators.similarity import _TOP_K, sim_ivfpq_recall

    r = sim_ivfpq_recall(spark, sf_dir).toPandas()
    assert (r.n_hits.between(0, _TOP_K)).all()
    assert ((r.recall_at_k - r.n_hits / _TOP_K).abs() < 1e-12).all()
    assert r.n_hits.sum() > 0


# --- perceptual-hash near-dup -------------------------------------------------


def test_phash_pairs_exactly_match_brute_force(spark, sf_dir):
    """Banded candidate generation + recheck returns EXACTLY the pairs a
    brute-force all-pairs Hamming scan finds at the threshold (pigeonhole:
    hd <= bands-1 guarantees a shared band, and no bucket is over cap at
    the gate SFs — so banding loses nothing here)."""
    from exact_spark.operators.multimodal import (
        _PHASH_MAX_HD,
        _phash_df,
        multimodal_phash_neardup,
        phash_bucket_census,
    )

    census = phash_bucket_census(spark, sf_dir).collect()[0]
    assert census["n_groups_over_cap"] == 0  # precondition for exactness

    hashes = _phash_df(spark, sf_dir).toPandas()
    got = multimodal_phash_neardup(spark, sf_dir).toPandas()
    hs = dict(zip(hashes.doc_id, hashes.phash))
    ids = sorted(hs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hd = sum(x != y for x, y in zip(hs[a], hs[b]))
            if hd <= _PHASH_MAX_HD:
                want.add((a, b, hd))
    assert set(zip(got.doc_a, got.doc_b, got.hamming)) == want


def test_phash_is_32bit_string_and_exact_dups_collide(spark, sf_dir):
    from exact_spark import io
    from exact_spark.operators.multimodal import _PHASH_BITS, _phash_df

    hashes = _phash_df(spark, sf_dir).toPandas()
    assert (hashes.phash.str.len() == _PHASH_BITS).all()
    assert hashes.phash.str.fullmatch("[01]+").all()
    # identical payloads must hash identically (the dedup base case)
    docs = io.load(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    merged = docs.merge(hashes, on="doc_id")
    by_text = merged.groupby("text")["phash"].nunique()
    assert (by_text == 1).all()


# --- cross-corpus fingerprint contamination -----------------------------------


def test_contamination_counts_and_flag_are_consistent(spark):
    from exact_spark.operators.dedup import (
        _CONTAM_FLAG_DEN,
        _CONTAM_FLAG_NUM,
        decontaminate_fingerprint,
    )

    got = decontaminate_fingerprint(spark, SF_DIR_MID).toPandas()
    assert len(got) > 0
    assert (got.n_contained <= got.n_fp).all()
    assert (got.n_fp > 0).all()
    want_flag = got.n_contained * _CONTAM_FLAG_DEN >= got.n_fp * _CONTAM_FLAG_NUM
    assert (got.flagged == want_flag).all()
    assert ((got.containment - got.n_contained / got.n_fp).abs() < 1e-12).all()


def test_contamination_matches_brute_force_set_math(spark, sf_dir):
    """Containment equals literal set arithmetic over the winnow selections
    (collected small at sf0.001) — the definition, not the plan."""
    from exact_spark import io
    from exact_spark.operators.dedup import (
        _CONTAM_EVAL_SOURCE,
        decontaminate_fingerprint,
    )
    from exact_spark.operators.text import _winnow_selected

    sel = _winnow_selected(spark, sf_dir).toPandas()
    src = io.load(spark, sf_dir, "documents").select("doc_id", "source").toPandas()
    sel = sel.merge(src, on="doc_id")
    train = set(sel[sel.source != _CONTAM_EVAL_SOURCE].fp)
    got = decontaminate_fingerprint(spark, sf_dir).toPandas().set_index("eval_id")
    ev = sel[sel.source == _CONTAM_EVAL_SOURCE]
    assert set(ev.doc_id) == set(got.index)
    for doc_id, grp in ev.groupby("doc_id"):
        fps = set(grp.fp)
        assert got.loc[doc_id, "n_fp"] == len(fps)
        assert got.loc[doc_id, "n_contained"] == len(fps & train)


# --- URL canonical dedup --------------------------------------------------------


def test_url_canonicalizer_output_invariants(spark):
    from exact_spark import io
    from exact_spark.operators.dedup import dedup_url_canonical

    got = dedup_url_canonical(spark, SF_DIR_MID).toPandas()
    n_docs = io.load(spark, SF_DIR_MID, "documents").count()
    # every doc lands in exactly one group
    assert got.n_docs.sum() == n_docs
    c = got.canon_url
    assert c.str.startswith("https://").all()
    assert (~c.str.contains("www.", regex=False)).all()
    assert (~c.str.contains("?", regex=False)).all()
    assert (~c.str.endswith("/")).all()
    assert (c == c.str.lower()).all()
    assert c.is_unique
    # the mess is real: some groups collapse multiple raw variants
    assert (got.n_variants > 1).any()
    assert (got.n_docs > 1).any()


def test_url_canonical_groups_match_their_variants(spark, sf_dir):
    """example_raw must canonicalize back to its own group key (round-trip
    through an independent python canonicalizer)."""
    from exact_spark.operators.dedup import dedup_url_canonical

    def canon(url: str) -> str:
        u = url.split("?", 1)[0].lower()
        u = u.replace("http://", "https://").replace("https://www.", "https://")
        return u[:-1] if u.endswith("/") else u

    got = dedup_url_canonical(spark, sf_dir).toPandas()
    for _, row in got.iterrows():
        assert canon(row.example_raw) == row.canon_url
