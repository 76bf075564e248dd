"""Bucketed co-located join: prove the Exchange disappears.

The scale claim behind ``write_bucketed`` is testable locally: a fact-fact
equi-join on unbucketed sides shuffles BOTH sides; the same join on tables
bucketed into the same bucket count on the join key runs with zero
Exchange operators in the physical plan.
"""

from __future__ import annotations

import io as _io
import contextlib

import pytest
from pyspark.sql import functions as F

from exact_spark import io
from exact_spark.operators.relational import write_bucketed


def _plan_of(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = io.load(spark, sf_dir, "orders")
    lineitem = io.load(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")

    # disable broadcast: the point is the big-big case where neither side
    # fits in memory — locally the tiny tables would broadcast instead
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = _plan_of(joined)
        # co-located: the join itself runs with zero shuffles
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        # identical row-level result to the unbucketed join
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert plain.count() == joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    orders = io.load(spark, sf_dir, "orders")
    lineitem = io.load(spark, sf_dir, "lineitem")
    # disable broadcast so the comparison is SMJ vs SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_of(orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Exchange") >= 2  # both sides shuffle without bucketing
