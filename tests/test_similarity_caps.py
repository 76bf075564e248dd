"""Degenerate-bucket cap property test for the embedding LSH operator.

Same adversarial shape as tests/test_dedup_caps.py, ported to the
embedding table: mass-duplicated vectors (zero-information boilerplate
embeddings) all land in one (band, bucket) of the sign-projection LSH, so
an uncapped candidate join expands B^2/2 pairs inside a single task. With
the cap (similarity._EMB_BUCKET_CAP) the hot bucket is dropped while a
genuine near-dup pair elsewhere still surfaces, and the DuckDB oracle SQL
carries the same cap so the capped semantics stay oracle-checkable.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exact_spark.operators.similarity import _EMB_BUCKET_CAP, sim_neardup_lsh
from exact_spark.registry import REGISTRY, _load_all
from tests.oracle import compare

_DIM = 16


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """embeddings.parquet: _EMB_BUCKET_CAP+20 identical vectors + a
    near-identical pair (negated base, so its LSH bucket is the bitwise
    complement of the hot bucket in every band) + unrelated fillers."""
    rng = np.random.RandomState(7)
    n_hot = _EMB_BUCKET_CAP + 20
    hot = np.full(_DIM, 0.6, dtype=np.float32)
    rows: list[tuple[int, np.ndarray, int]] = [(i, hot, 0) for i in range(n_hot)]
    base = -hot * (1.0 + 0.01 * rng.rand(_DIM).astype(np.float32))
    rows.append((10_000, base.astype(np.float32), 1))
    rows.append((10_001, (base * 1.01).astype(np.float32), 1))
    for j in range(3):
        v = rng.randn(_DIM).astype(np.float32)
        rows.append((20_000 + j, v, 2))
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1].tolist() for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("adversarial_emb")
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


def test_cap_drops_degenerate_bucket(spark, adversarial_dir):
    got = sim_neardup_lsh(spark, adversarial_dir).toPandas()
    hot_ids = set(range(_EMB_BUCKET_CAP + 20))
    # no pair from the over-cap identical block: B^2/2 would be ~24k rows
    assert not any(a in hot_ids and b in hot_ids for a, b in zip(got.vec_a, got.vec_b))
    # the genuine near-dup pair still surfaces (cosine ~1 >= threshold)
    assert ((got.vec_a == 10_000) & (got.vec_b == 10_001)).any()


def test_capped_semantics_match_oracle(spark, adversarial_dir):
    _load_all()
    spec = REGISTRY["sim_neardup_lsh"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/embeddings.parquet')"
    )
    sp = spec.fn(spark, adversarial_dir)
    oc = con.execute(spec.sql).fetchdf()
    assert compare(sp, oc, "sim_neardup_lsh") == []
