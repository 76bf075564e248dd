"""Detection models (SURVEY.md §2.7) — Spark-native.

Round-1 scope: the deterministic MLlib decision-tree pipeline (M5) as the
end-to-end e2e detector, registered as a rows-only query (model training is
not SQL-expressible, so no DuckDB oracle; the driver records a rows-only
check). Broadcast-model pandas-UDF scoring (M1-M3) and SparkXGB (M4) follow
in later rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark.operators.timeseries import canonical_events
from exact_spark.registry import register


@register(
    "ml_decision_tree_e2e",
    sql=None,  # model training is not SQL-expressible -> rows-only check
    doc="M5 + §7.2 minimum slice: MinMax-scale -> DecisionTreeClassifier "
    "(seed fixed) on the 85% split -> detect on all rows -> confusion "
    "metrics (decision_tree.py:13-871 re-expressed on pyspark.ml).",
)
def ml_decision_tree_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler
    from pyspark.ml import Pipeline

    df = canonical_events(spark, sf_dir).withColumn(
        "hour", ((F.col("ts_epoch") / 3600) % 24).cast("double")
    )
    n_total = df.count()
    cut = int(0.85 * n_total)
    train = df.filter(F.col("id") <= cut)

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["value", "hour"], outputCol="raw_features"),
            MinMaxScaler(inputCol="raw_features", outputCol="features"),
            DecisionTreeClassifier(
                labelCol="label", featuresCol="features", maxDepth=5, seed=42
            ),
        ]
    )
    model = pipe.fit(train)
    scored = model.transform(df).select(
        "id", "label", F.col("prediction").cast("int").alias("predicted")
    )
    tp = F.sum(F.when((F.col("predicted") == 1) & (F.col("label") == 1), 1).otherwise(0))
    tn = F.sum(F.when((F.col("predicted") == 0) & (F.col("label") == 0), 1).otherwise(0))
    fp = F.sum(F.when((F.col("predicted") == 1) & (F.col("label") == 0), 1).otherwise(0))
    fn = F.sum(F.when((F.col("predicted") == 0) & (F.col("label") == 1), 1).otherwise(0))
    return scored.agg(
        tp.cast("long").alias("tp"),
        tn.cast("long").alias("tn"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
