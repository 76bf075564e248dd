"""text_repetition_profile property tests on constructed documents with
known repetition structure (the Gopher filter contracts)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exact_spark.operators.text import text_repetition_profile
from exact_spark.registry import REGISTRY, _load_all
from tests.oracle import compare


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    docs = [
        # 0: degenerate loop — one bigram repeated; rep_keep must be False
        (0, "spam ham " * 30),
        # 1: every word distinct — maximal diversity, kept
        (1, " ".join(f"w{i}" for i in range(40))),
        # 2: one dominant word (20 of 50 = 40% > 12%) — dropped
        (2, ("x " * 20) + " ".join(f"y{i}" for i in range(30))),
        # 3: too short (< 3 words) — excluded from the profile entirely
        (3, "one two"),
        # 4: mild natural repetition (top word 3/30 = 10% <= 12%) — kept
        (4, "the cat sat on a mat while the dog ran past an old red barn door "
            "and birds flew over green hills toward the distant river bend at dusk"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    out = tmp_path_factory.mktemp("rep_docs")
    pq.write_table(tbl, out / "documents.parquet")
    return str(out)


def test_repetition_contracts(spark, docs_dir):
    got = text_repetition_profile(spark, docs_dir).toPandas().set_index("doc_id")
    assert set(got.index) == {0, 1, 2, 4}  # doc 3 below the word floor
    # doc 0: 60 words of a 2-word loop -> bigram dups near 1, top word 50%
    assert got.loc[0, "dup_2gram_frac"] > 0.9
    assert not got.loc[0, "rep_keep"]
    # doc 1: all-distinct
    assert got.loc[1, "distinct_word_frac"] == 1.0
    assert got.loc[1, "dup_2gram_frac"] == 0.0
    assert got.loc[1, "rep_keep"]
    # doc 2: dominant word fraction exact (20/50)
    assert abs(got.loc[2, "top_word_frac"] - 0.4) < 1e-12
    assert not got.loc[2, "rep_keep"]
    assert got.loc[4, "rep_keep"]


def test_constructed_docs_match_oracle(spark, docs_dir):
    _load_all()
    spec = REGISTRY["text_repetition_profile"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet')"
    )
    assert compare(spec.fn(spark, docs_dir), con.execute(spec.sql).fetchdf(),
                   "text_repetition_profile") == []
