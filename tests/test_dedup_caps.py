"""Degenerate-bucket cap property tests for the LSH dedup operators.

An adversarial corpus where one text repeats more often than
``_LSH_BUCKET_CAP`` puts every copy into the same LSH bucket / probe
bucket. Without the cap that bucket expands to B^2/2 pairs in one task —
the single-task quadratic blowup that kills the operator at scale. With
the cap the bucket is dropped (mass-identical content is exact-dedup's
job) while genuine near-dup pairs elsewhere in the corpus still surface.

The cap lives in BOTH the Spark plan and the DuckDB oracle SQL, so the
capped semantics themselves stay oracle-checkable — verified here on the
adversarial corpus, not just the benign testdata.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from exact_spark.operators.dedup import (
    _LSH_BUCKET_CAP,
    dedup_minhash_lsh,
    dedup_simhash_pairs,
)
from exact_spark.registry import REGISTRY, _load_all
from tests.oracle import compare

_BOILER = (
    "this exact boilerplate disclaimer paragraph repeats verbatim across "
    "the whole crawl and would bucket every copy together"
)


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """documents.parquet: _LSH_BUCKET_CAP+20 identical docs + a near-dup
    pair + a handful of unrelated docs."""
    n_hot = _LSH_BUCKET_CAP + 20
    rows = [(i, _BOILER) for i in range(n_hot)]
    near_a = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near_b = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
    rows.append((10_000, near_a))
    rows.append((10_001, near_b))
    for j, filler in enumerate(
        [
            "completely unrelated text about spark physical plans and shuffles",
            "another singleton document mentioning isotonic calibration only",
            "third loner document on watermarked streaming aggregation windows",
        ]
    ):
        rows.append((20_000 + j, filler))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "test"
    df["n_chars"] = df["text"].str.len()
    out = tmp_path_factory.mktemp("adversarial")
    df.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash_pairs"])
def test_cap_drops_degenerate_bucket(spark, adversarial_dir, name):
    fn = {"dedup_minhash_lsh": dedup_minhash_lsh, "dedup_simhash_pairs": dedup_simhash_pairs}[name]
    got = fn(spark, adversarial_dir).toPandas()
    hot_ids = set(range(_LSH_BUCKET_CAP + 20))
    # no pair from the over-cap identical block: B^2/2 would be ~24k rows
    assert not any(a in hot_ids and b in hot_ids for a, b in zip(got.doc_a, got.doc_b))
    # the genuine near-dup pair still surfaces
    assert ((got.doc_a == 10_000) & (got.doc_b == 10_001)).any()


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_simhash_pairs"])
def test_capped_semantics_match_oracle(spark, adversarial_dir, name):
    """The DuckDB oracle carries the same cap — drive it on the adversarial
    corpus and require the exact driver-style match."""
    _load_all()
    spec = REGISTRY[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet')"
    )
    sp = spec.fn(spark, adversarial_dir)
    oc = con.execute(spec.sql).fetchdf()
    assert compare(sp, oc, name) == []


def test_fuzzy_edit_hot_band_linear_and_connected(spark, adversarial_dir):
    """dedup_fuzzy_edit's SNM candidate generation (r07: the old
    size<=cap drop filter excluded 15/18 bands at sf0.1 — a length band
    is each doc's ONLY route — and chunked-exhaustive expansion cost
    cap^2/2 per chunk): the over-cap identical block now emits exactly
    n*w - w(w+1)/2 within-window pairs (LINEAR in block size), every
    pair at edit distance 0, and the pair set CONNECTS the whole block
    into one duplicate group — the property grouping consumes. The
    genuine near-dup pair elsewhere still surfaces."""
    from exact_spark.operators.dedup import _FUZZY_WINDOW, dedup_fuzzy_edit

    n_hot = _LSH_BUCKET_CAP + 20
    got = dedup_fuzzy_edit(spark, adversarial_dir).toPandas()
    hot_ids = set(range(n_hot))
    hot = got[got.doc_a.isin(hot_ids) & got.doc_b.isin(hot_ids)]
    w = _FUZZY_WINDOW
    assert len(hot) == n_hot * w - w * (w + 1) // 2  # linear, not n^2/2
    assert (hot.edit_dist == 0).all()
    # chain connectivity: union-find over the found pairs yields ONE group
    parent = {i: i for i in hot_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(hot.doc_a, hot.doc_b):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in hot_ids}) == 1
    assert ((got.doc_a == 10_000) & (got.doc_b == 10_001)).any()


@pytest.mark.parametrize(
    "gate_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def test_fuzzy_edit_snm_matches_exhaustive_truth_at_gate_sf(spark, gate_dir):
    """At BOTH gate scale factors every true within-band pair sits inside
    the SNM window and sub-key (verified: 24 == 24 at sf0.001/sf0.01), so
    the SNM result must EQUAL the uncapped exhaustive truth — pinning that
    the window/sub-key trade-off costs nothing where the oracle gate runs,
    and any future window/ordering/sub-key change that breaks it is
    visible at the sf it breaks."""
    import duckdb

    sf_dir = gate_dir

    from exact_spark.operators.dedup import (
        _FUZZY_BAND_WIDTH,
        _FUZZY_MAX_DIST,
        _FUZZY_PREFIX,
        dedup_fuzzy_edit,
    )

    got = {
        (int(a), int(b), int(d))
        for a, b, d in dedup_fuzzy_edit(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = set(
        map(
            tuple,
            con.execute(f"""
        WITH blocked AS (SELECT doc_id, n_chars // {_FUZZY_BAND_WIDTH} AS band,
                                substr(text, 1, {_FUZZY_PREFIX}) AS pre
                         FROM documents),
        cand AS (SELECT a.doc_id, b.doc_id, levenshtein(a.pre, b.pre) AS d
                 FROM blocked a JOIN blocked b USING (band)
                 WHERE a.doc_id < b.doc_id)
        SELECT * FROM cand WHERE d <= {_FUZZY_MAX_DIST}
        """).fetchall(),
        )
    )
    assert got == truth


def test_fuzzy_edit_capped_semantics_match_oracle(spark, adversarial_dir):
    _load_all()
    spec = REGISTRY["dedup_fuzzy_edit"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet')"
    )
    sp = spec.fn(spark, adversarial_dir)
    oc = con.execute(spec.sql).fetchdf()
    assert compare(sp, oc, "dedup_fuzzy_edit") == []
