"""Every silent cap gets a census (VERDICT r06 item 4, "no silent caps").

For each degenerate-bucket guard — _HOT_CAP, _LSH_BUCKET_CAP (minhash and
simhash keys), _FUZZY_BAND_CAP, _EMB_BUCKET_CAP, _SEM_CLUSTER_CAP — a
planted hot group makes the cap bind and the census must report NONZERO
dropped/split mass; on a benign corpus where nothing binds it must report
zero. The censuses share the operators' own key-construction helpers, so
a key-spec change cannot silently decouple the diagnostic from the guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exact_spark.operators.dedup import (
    _FUZZY_BAND_CAP,
    _HOT_CAP,
    _LSH_BUCKET_CAP,
    fuzzy_band_census,
    hot_shingle_census,
    lsh_bucket_census,
    simhash_bucket_census,
)
from exact_spark.operators.similarity import (
    _EMB_BUCKET_CAP,
    _SEM_CLUSTER_CAP,
    emb_bucket_census,
    sem_chunk_census,
)

_BOILER = (
    "this exact boilerplate disclaimer paragraph repeats verbatim across "
    "the whole crawl and would bucket every copy together"
)
_DIM = 16


@pytest.fixture(scope="module")
def hot_docs_dir(tmp_path_factory):
    """documents.parquet where one text repeats past every doc-side cap
    (identical texts share n_chars, every shingle, every LSH bucket and
    every simhash probe) + benign singletons."""
    n_hot = max(_HOT_CAP, _LSH_BUCKET_CAP, _FUZZY_BAND_CAP) + 25
    rows = [(i, _BOILER) for i in range(n_hot)]
    rows += [
        (50_000, "completely unrelated text about spark physical plans today"),
        (50_001, "another singleton document mentioning isotonic calibration"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "test"
    df["n_chars"] = df["text"].str.len()
    out = tmp_path_factory.mktemp("cap_census_docs")
    df.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.fixture(scope="module")
def benign_docs_dir(tmp_path_factory):
    """A corpus of distinct texts in distinct length bands: no cap binds."""
    rows = [
        (i, f"unique document number {i} " + "word " * i) for i in range(40)
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "test"
    df["n_chars"] = df["text"].str.len()
    out = tmp_path_factory.mktemp("cap_census_benign")
    df.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.fixture(scope="module")
def hot_vecs_dir(tmp_path_factory):
    """embeddings.parquet where one mass-duplicated vector floods a
    sign-projection bucket AND one k-means cell past both embedding-side
    caps. The 8 seed rows (vec_id < k, k at its _SEM_K_MIN floor for this
    237-vector corpus = the centroids) are DISTINCT
    directions and the hot block is an exact copy of seed 3's direction —
    byte-identical copies, so every copy shares the same LSH buckets and
    the same argmax cell (noisy copies near a zero projection would
    scatter across buckets and the cap would not bind)."""
    n_hot = max(_EMB_BUCKET_CAP, _SEM_CLUSTER_CAP) + 25
    rng = np.random.RandomState(3)
    seeds = []
    rows = []
    for i in range(8):
        v = np.zeros(_DIM, dtype=np.float32)
        v[2 * i] = 1.0
        v[2 * i + 1] = 0.3
        seeds.append(v)
        rows.append((i, v))
    hot = (seeds[3] * 0.9).astype(np.float32)
    rows += [(100 + j, hot) for j in range(n_hot)]
    rows += [(90_000 + j, rng.randn(_DIM).astype(np.float32)) for j in range(4)]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("cap_census_vecs")
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


@pytest.mark.parametrize(
    "census,cap",
    [
        (hot_shingle_census, _HOT_CAP),
        (lsh_bucket_census, _LSH_BUCKET_CAP),
        (simhash_bucket_census, _LSH_BUCKET_CAP),
        (fuzzy_band_census, _FUZZY_BAND_CAP),
    ],
    ids=["hot_shingle", "lsh_bucket", "simhash_bucket", "fuzzy_band"],
)
def test_doc_caps_report_nonzero_when_binding(spark, hot_docs_dir, census, cap):
    got = _one(census(spark, hot_docs_dir))
    assert got["cap"] == cap
    assert got["n_groups_over_cap"] > 0
    assert got["n_members_over_cap"] > cap
    assert got["max_group_size"] > cap


@pytest.mark.parametrize(
    "census",
    [hot_shingle_census, lsh_bucket_census, fuzzy_band_census],
    ids=["hot_shingle", "lsh_bucket", "fuzzy_band"],
)
def test_doc_caps_report_zero_on_benign_corpus(spark, benign_docs_dir, census):
    got = _one(census(spark, benign_docs_dir))
    assert got["n_groups_over_cap"] == 0
    assert got["n_members_over_cap"] == 0


def test_emb_bucket_census_binds(spark, hot_vecs_dir):
    got = _one(emb_bucket_census(spark, hot_vecs_dir))
    assert got["cap"] == _EMB_BUCKET_CAP
    assert got["n_groups_over_cap"] > 0
    assert got["n_members_over_cap"] > _EMB_BUCKET_CAP


def test_sem_chunk_census_binds(spark, hot_vecs_dir):
    got = _one(sem_chunk_census(spark, hot_vecs_dir))
    assert got["cap"] == _SEM_CLUSTER_CAP
    assert got["n_groups_over_cap"] > 0
    # split-cluster mass, not dropped mass: the r07 chunking keeps routes
    assert got["n_members_in_split_clusters"] > _SEM_CLUSTER_CAP
    # boundary exposure = members past each split cluster's first chunk
    # (the fixture's one hot cluster holds n_hot + seed 3 members)
    assert (
        got["n_members_beyond_first_chunk"]
        == got["n_members_in_split_clusters"] - _SEM_CLUSTER_CAP
    )
    assert 0 < got["n_members_beyond_first_chunk"] < _SEM_CLUSTER_CAP


def test_sem_chunk_census_zero_at_sf001(spark, sf_dir):
    # the real sf0.001 corpus: every cluster under cap -> no split exposure
    got = _one(sem_chunk_census(spark, sf_dir))
    assert got["n_groups_over_cap"] == 0
    assert got["n_members_in_split_clusters"] == 0
    assert got["n_members_beyond_first_chunk"] == 0
    assert got["quantizer"] == "seed"
    assert got["k"] == 8  # 500 vectors / occ 64 -> ceil = 8 (= the floor)


def test_sem_chunk_census_kmeans_policy(spark, sf_dir):
    # ADVICE r07: the trained-quantizer occupancy policy needs its own
    # census — kmeans clusters the space differently from the seed rows,
    # so its cap exposure is observable separately
    got = _one(sem_chunk_census(spark, sf_dir, quantizer="kmeans"))
    assert got["quantizer"] == "kmeans"
    assert got["n_groups"] <= got["k"]
    assert got["n_groups_over_cap"] == 0  # sf0.001: nothing binds


@pytest.mark.parametrize("quantizer", ["seed", "kmeans"])
def test_sem_k_occupancy_driven_across_sfs(spark, quantizer):
    """VERDICT r07 item 1: semantic-dedup k must grow with the corpus so
    max cluster size does NOT grow linearly sf0.01 -> sf0.1 (with fixed
    k=8 it did: ~62 -> ~250 mean). N grows 4x (500 -> 2000); k must grow
    4x (8 -> 32) and the largest cluster must stay well under the linear
    extrapolation of the sf0.01 maximum."""
    small = _one(sem_chunk_census(spark, "/root/testdata/sf0.01", quantizer))
    big = _one(sem_chunk_census(spark, "/root/testdata/sf0.1", quantizer))
    assert (small["n_corpus"], big["n_corpus"]) == (500, 2000)
    assert (small["k"], big["k"]) == (8, 32)
    growth = big["n_corpus"] / small["n_corpus"]  # 4x
    # sub-linear: the biggest cluster grows strictly slower than the corpus
    assert big["max_group_size"] < small["max_group_size"] * growth
    # and the occupancy target holds in the mean at BOTH scales
    assert big["n_corpus"] / big["k"] <= small["n_corpus"] / small["k"]


def test_basket_cap_census(spark, sf_dir, tmp_path):
    """rel_market_basket's basket cap: zero on the TPC-H-ish testdata
    (max ~11 distinct parts per order), nonzero on a planted mega-basket."""
    import pandas as pd

    from exact_spark.operators.relational import _MB_BASKET_CAP, basket_cap_census

    got = _one(basket_cap_census(spark, sf_dir))
    assert got["cap"] == _MB_BASKET_CAP
    assert got["n_groups_over_cap"] == 0
    assert got["max_group_size"] <= _MB_BASKET_CAP

    rows = [(1, p) for p in range(_MB_BASKET_CAP + 5)] + [(2, 0), (2, 1)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet", index=False
    )
    hot = _one(basket_cap_census(spark, str(tmp_path)))
    assert hot["n_groups_over_cap"] == 1
    assert hot["n_members_over_cap"] == _MB_BASKET_CAP + 5
