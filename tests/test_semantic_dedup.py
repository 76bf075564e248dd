"""Semantic dedup (SemDedup) property + degenerate-cluster cap tests.

Adversarial shape mirrors tests/test_similarity_caps.py: a mass-duplicated
embedding floods ONE cluster of the coarse quantizer, so an uncapped
within-cluster pairing is a B^2/2 blowup inside a single collected bucket.
r06 verdict: the old size<=cap filter DROPPED the whole over-cap cluster —
a silent no-op at scale, since a k-means cell is each vector's only
candidate route. Now over-cap clusters are CHUNKED by the quantized-
embedding-prefix ordering (<= _SEM_CLUSTER_CAP members per collected row),
so planted duplicates inside the over-cap cluster are FOUND, work per row
stays bounded, and the DuckDB oracle SQL carries the same chunking so the
semantics stay oracle-checkable.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exact_spark.operators.similarity import _SEM_CLUSTER_CAP, dedup_semantic
from exact_spark.registry import REGISTRY, _load_all
from tests.oracle import compare

_DIM = 16


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """embeddings.parquet: 8 seed rows (orthogonal-ish centroids), a hot
    block of _SEM_CLUSTER_CAP+30 copies of seed 3's direction, and one
    genuine near-dup pair aligned with seed 5."""
    rng = np.random.RandomState(11)
    rows: list[tuple[int, np.ndarray, int]] = []
    seeds = []
    for i in range(8):
        v = np.zeros(_DIM, dtype=np.float32)
        v[2 * i] = 1.0
        v[2 * i + 1] = 0.3
        seeds.append(v)
        rows.append((i, v, 0))
    hot = seeds[3] * 0.9
    for j in range(_SEM_CLUSTER_CAP + 30):
        rows.append((100 + j, hot, 1))
    near_a = seeds[5] * 1.1 + 0.02 * rng.rand(_DIM).astype(np.float32)
    near_b = near_a * 0.98
    rows.append((5_000, near_a.astype(np.float32), 2))
    rows.append((5_001, near_b.astype(np.float32), 2))
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1].tolist() for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("adversarial_sem")
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


def test_over_cap_cluster_chunked_not_dropped(spark, adversarial_dir):
    """The planted-duplicate-at-cluster-size>cap regression (r06 verdict):
    every member of the over-cap cluster keeps a candidate route, so the
    mass-duplicated block dedupes to one representative PER CHUNK instead
    of silently vanishing."""
    got = dedup_semantic(spark, adversarial_dir).toPandas()
    hot_ids = set(range(100, 100 + _SEM_CLUSTER_CAP + 30))
    dropped_hot = set(int(v) for v in got.vec_id) & hot_ids
    # all identical copies drop except at most one representative per chunk
    # (2 chunks here: 231 hot members + seed 3 > cap)
    assert len(dropped_hot) >= len(hot_ids) - 2
    # no collected group exceeded the cap: each dropped hot member's
    # representative is a lower id from its own chunk
    hot = got[got.vec_id.isin(list(hot_ids))]
    assert (hot.dup_of < hot.vec_id).all()
    assert (hot.cosine >= 0.999).all()  # identical direction copies
    # the genuine duplicates in the small cluster still dedupe: both drop
    # to the lowest qualifying representative (seed 5, which they align to)
    for vid in (5_000, 5_001):
        row = got[got.vec_id == vid]
        assert len(row) == 1 and int(row.dup_of.iloc[0]) == 5


def test_capped_semantics_match_oracle(spark, adversarial_dir):
    _load_all()
    spec = REGISTRY["dedup_semantic"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/embeddings.parquet')"
    )
    sp = spec.fn(spark, adversarial_dir)
    oc = con.execute(spec.sql).fetchdf()
    assert compare(sp, oc, "dedup_semantic") == []


def test_dropped_set_is_consistent(spark, sf_dir):
    """Every dropped vector cites a KEPT representative (dup_of never
    itself dropped... by the lower-id rule a representative may itself be
    dropped only if ITS representative has an even lower id — the chain
    bottoms out; here we check dup_of < vec_id and clusters agree)."""
    got = dedup_semantic(spark, sf_dir).toPandas()
    assert (got.dup_of < got.vec_id).all()
    assert (got.cosine >= 0.30).all()
