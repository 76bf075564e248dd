"""The local gate: every registered query with an oracle must hash-match
DuckDB on sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from exact_spark.registry import REGISTRY, _load_all
from tests.oracle import compare, duck_con

_load_all()
_WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.sql is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    odf = con.execute(spec.sql).fetchdf()
    errs = compare(sdf, odf, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
