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


def test_fuzzy_edit_cap_drops_degenerate_band(spark, adversarial_dir):
    """dedup_fuzzy_edit's length-band cap: the over-cap identical block all
    shares one n_chars band — without the cap that band alone expands to
    B^2/2 Levenshtein calls in one task. The band must be dropped while the
    genuine near-dup pair (same band, small edit) still surfaces."""
    from exact_spark.operators.dedup import _FUZZY_BAND_CAP, dedup_fuzzy_edit

    assert _FUZZY_BAND_CAP <= _LSH_BUCKET_CAP + 20  # fixture is over-cap
    got = dedup_fuzzy_edit(spark, adversarial_dir).toPandas()
    hot_ids = set(range(_LSH_BUCKET_CAP + 20))
    assert not any(a in hot_ids and b in hot_ids for a, b in zip(got.doc_a, got.doc_b))
    assert ((got.doc_a == 10_000) & (got.doc_b == 10_001)).any()


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
