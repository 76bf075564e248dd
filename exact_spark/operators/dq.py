"""Data-quality expectation checks (the Great-Expectations/dbt-test pattern,
engine-side): declarative per-column expectations evaluated in ONE pass per
table, plus referential integrity as an anti-join — the validation gate a
pipeline runs before promoting a batch.

Scale shape: every per-column expectation folds into a single conditional
aggregate over one scan (no per-expectation pass — a 100-expectation suite
on a 100 TB table is still one scan), uniqueness rides the same scan via a
two-phase distinct count, and referential integrity reduces the referenced
side to its distinct keys before a LEFT ANTI join. Output is one row per
expectation with violation counts — tiny at any input size.

No reference counterpart (the reference validates nothing on ingest); the
pattern is the published expectation-suite shape re-expressed as Spark
conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark import io
from exact_spark.registry import register
from exact_spark.session import tune_session


@register(
    "dq_expectations",
    sql="""
    WITH o AS (
        SELECT count(*) AS n,
               SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_key,
               SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS bad_price,
               SUM(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                   THEN 1 ELSE 0 END) AS bad_priority,
               count(*) - COUNT(DISTINCT o_orderkey) AS dup_keys
        FROM orders
    ),
    li AS (
        SELECT count(*) AS n,
               SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0.0 THEN 1 ELSE 0 END) AS bad_qty,
               SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) AS bad_discount
        FROM lineitem
    ),
    ri AS (
        SELECT count(*) AS orphans FROM orders o2
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o2.o_custkey)
    )
    SELECT * FROM (
        SELECT 'orders' AS tbl, 'orderkey_not_null' AS expectation,
               CAST(o.null_key AS BIGINT) AS n_violations, o.n AS n_rows FROM o
        UNION ALL
        SELECT 'orders', 'totalprice_positive', CAST(o.bad_price AS BIGINT), o.n FROM o
        UNION ALL
        SELECT 'orders', 'priority_in_domain', CAST(o.bad_priority AS BIGINT), o.n FROM o
        UNION ALL
        SELECT 'orders', 'orderkey_unique', CAST(o.dup_keys AS BIGINT), o.n FROM o
        UNION ALL
        SELECT 'lineitem', 'quantity_positive', CAST(li.bad_qty AS BIGINT), li.n FROM li
        UNION ALL
        SELECT 'lineitem', 'discount_in_0_1', CAST(li.bad_discount AS BIGINT), li.n FROM li
        UNION ALL
        SELECT 'orders', 'custkey_references_customer', CAST(ri.orphans AS BIGINT),
               (SELECT n FROM o) FROM ri
    )
    """,
    doc="Declarative expectation suite over the star schema (see module "
    "doc): null / range / domain / uniqueness expectations fold into ONE "
    "conditional-aggregate scan per table, referential integrity is a "
    "LEFT ANTI join against the distinct-reduced referenced side, and the "
    "result is one row per expectation with its violation count — the "
    "promote-or-quarantine gate shape, costing one scan per table at any "
    "size.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = io.load(spark, sf_dir, "orders")
    li = io.load(spark, sf_dir, "lineitem")
    cust = io.load(spark, sf_dir, "customer").select("c_custkey").distinct()

    domain = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_key"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0.0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("bad_price"),
        F.sum(F.when(~F.col("o_orderpriority").isin(*domain), 1).otherwise(0))
        .cast("long")
        .alias("bad_priority"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
    ).collect()[0]
    l = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0.0), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_discount"),
    ).collect()[0]
    orphans = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count()

    rows = [
        ("orders", "orderkey_not_null", int(o["null_key"]), int(o["n"])),
        ("orders", "totalprice_positive", int(o["bad_price"]), int(o["n"])),
        ("orders", "priority_in_domain", int(o["bad_priority"]), int(o["n"])),
        ("orders", "orderkey_unique", int(o["dup_keys"]), int(o["n"])),
        ("lineitem", "quantity_positive", int(l["bad_qty"]), int(l["n"])),
        ("lineitem", "discount_in_0_1", int(l["bad_discount"]), int(l["n"])),
        ("orders", "custkey_references_customer", int(orphans), int(o["n"])),
    ]
    return spark.createDataFrame(
        rows, "tbl string, expectation string, n_violations long, n_rows long"
    )


# --- per-column table profile ------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "dq_schema_profile",
    sql="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    )
    + "\n)",
    doc="Per-column table profile (the discovery pass every data platform "
    "runs on an unfamiliar table: volume, null rate, exact cardinality "
    "per column). Spark side computes ALL columns' counts + distincts in "
    "ONE aggregate over the table — multiple DISTINCT aggregates compile "
    "to a single Expand pass (|cols| row replicas, one scan, one "
    "shuffle), then unpivots the 1-row result to a row per column; the "
    "oracle's per-column UNION ALL reads the table |cols| times and "
    "states the same result. At genuinely wide tables swap exact "
    "distincts for approx_count_distinct — same plan, sketch registers "
    "instead of Expand.",
)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = io.load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("long").alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
        ]
    row = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, null_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_rows, n_null, n_distinct)"
        )
    )
