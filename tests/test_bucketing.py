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


def test_salted_join_parity_and_spread(spark):
    """salted_join must return exactly the plain join's rows (multiset)
    while spreading the hot key over multiple (key, salt) groups."""
    from exact_spark.operators.relational import salted_join

    # 90% of fact rows share one hot key
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("r"), F.col("id")).alias("label")
    )

    plain = fact.join(right, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, right, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    p = {(r["k"], r["label"], r["n"], float(r["s"])) for r in plain.collect()}
    s = {(r["k"], r["label"], r["n"], float(r["s"])) for r in salted.collect()}
    assert p == s

    # the hot key's rows occupy many distinct salt groups -> many reducers
    from pyspark.sql.functions import pmod, hash as f_hash, struct

    n_groups = (
        fact.withColumn("__salt", pmod(f_hash(struct("k", "v")), F.lit(8)))
        .filter(F.col("k") == 7)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_groups >= 6  # 1800 hot rows spread over ~8 salts


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir):
    """Z-order vs single-column sort: a linear (partkey-sorted) layout
    localizes only partkey predicates — a narrow suppkey slice touches
    essentially every file. The Z-ordered layout keeps BOTH dimensions
    locally contiguous, so either predicate touches a small fraction of
    files (sqrt scaling instead of all-files)."""
    import tempfile

    from pyspark.sql import functions as F

    from exact_spark.operators.relational import write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    # narrow slices: 1/16 of each key span
    p_hi = lo_p + (hi_p - lo_p) / 16
    s_hi = lo_s + (hi_s - lo_s) / 16

    with tempfile.TemporaryDirectory() as d:
        linear, zordered = f"{d}/linear", f"{d}/zorder"
        (
            li.repartitionByRange(16, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.parquet(linear)
        )
        write_zordered(li, zordered, ["l_partkey", "l_suppkey"], n_files=16)

        def files_touched(path, col, hi):
            return (
                spark.read.parquet(path)
                .filter(F.col(col) <= hi)
                .select(F.input_file_name())
                .distinct()
                .count()
            )

        lin_part = files_touched(linear, "l_partkey", p_hi)
        lin_supp = files_touched(linear, "l_suppkey", s_hi)
        z_part = files_touched(zordered, "l_partkey", p_hi)
        z_supp = files_touched(zordered, "l_suppkey", s_hi)

        n_files = 16
        # the linear layout serves its leading column well and the other
        # not at all
        assert lin_part <= 2
        assert lin_supp >= n_files - 1
        # z-order serves BOTH: each narrow slice touches well under half
        # the files (ideal ~sqrt(16)=4)
        assert z_part <= n_files // 2
        assert z_supp <= n_files // 2


def test_zorder_key_properties(spark):
    """Morton-key invariants: distinct bucket pairs map to distinct keys
    (bit interleave is a bijection) and the key is monotone in each
    dimension when the other is fixed at the bucket level."""
    from pyspark.sql import functions as F

    from exact_spark.operators.relational import zorder_column

    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("double").alias("x"),
        (F.col("id") / n).cast("long").cast("double").alias("y"),
    )
    z = zorder_column(grid, ["x", "y"], bits=5)
    rows = grid.withColumn("z", z).collect()
    seen = {}
    for r in rows:
        key = (r["x"], r["y"])
        assert r["z"] not in seen or seen[r["z"]] == key  # bijective on grid
        seen[r["z"]] = key
    assert len({r["z"] for r in rows}) == n * n
    by_y = {}
    for r in sorted(rows, key=lambda r: (r["y"], r["x"])):
        by_y.setdefault(r["y"], []).append(r["z"])
    for zs in by_y.values():  # monotone in x for fixed y
        assert zs == sorted(zs)


def test_zorder_null_and_empty_guard(spark):
    """Advisor guard: empty frames / all-null columns must not raise at
    plan-build time, and null values cluster into the low bucket."""
    from pyspark.sql import functions as F

    from exact_spark.operators.relational import zorder_column

    empty = spark.range(0).select(
        F.col("id").cast("double").alias("x"), F.col("id").cast("double").alias("y")
    )
    z = zorder_column(empty, ["x", "y"], bits=4)  # must not raise
    assert empty.select(z.alias("z")).count() == 0

    withnull = spark.createDataFrame(
        [(None, 1.0), (2.0, None), (3.0, 4.0), (None, None)], "x double, y double"
    )
    vals = [
        r["z"]
        for r in withnull.select(
            zorder_column(withnull, ["x", "y"], bits=4).alias("z")
        ).collect()
    ]
    assert all(v is not None for v in vals)
    # an all-null column degenerates to the low bucket, never a TypeError
    allnull = spark.createDataFrame([(None, 1.0), (None, 2.0)], "x double, y double")
    assert allnull.select(
        zorder_column(allnull, ["x", "y"], bits=4).alias("z")
    ).count() == 2
