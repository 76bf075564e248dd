"""Probability calibration for the M6 margin family (SURVEY §2.7 /
§7.3's named route).

Reference: ``Backend/ML_models/SGDClassifier.py:426-453`` — hinge-loss
models (margin outputs, no native probabilities) are wrapped in
``CalibratedClassifierCV(method='isotonic')`` fitted on an internal
stratified split.

Spark-first: the base ``LinearSVC`` (the hinge analog) trains on folds
!= 0 of the md5-stratified deal (``cv.py``), its raw margins on held-out
fold 0 feed MLlib ``IsotonicRegression`` (margin -> P(anomaly), a
monotone step function), and scoring is one distributed transform chain —
assemble, scale, margin, isotonic — with no driver materialization.
Isotonic regression fitted on {0,1} labels is bounded in [0, 1] and
monotone non-decreasing by construction, which the property tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exact_spark.ml.cv import FOLD_COL, stratified_kfold
from exact_spark.ml.models import DetectorModel, MLlibClassifierDetector


class CalibratedMarginDetector(DetectorModel):
    """LinearSVC margins + isotonic probability calibration
    (SGDClassifier.py:426-453's CalibratedClassifierCV(isotonic) shape)."""

    def __init__(self, base_algo: str = "linear_svc", k: int = 3, seed: int = 42,
                 threshold: float = 0.5, base_params: dict | None = None):
        # isotonic calibration needs the margin ORDERING, not a fully
        # converged separator — half the default OWLQN iterations halves
        # the dominant fit cost with no effect on the monotone mapping's
        # contract (callers can override via base_params)
        self.base = MLlibClassifierDetector(
            algo=base_algo, seed=seed,
            params={"maxIter": 5, "tol": 1e-3, **(base_params or {})},
        )
        self.k = k
        self.seed = seed
        self.threshold = threshold
        self.iso_model = None

    def _margins(self, df: DataFrame, feature_cols: list[str]) -> DataFrame:
        """(id, label?, margin): the signed distance from the separating
        hyperplane — element 2 of LinearSVC's rawPrediction."""
        from pyspark.ml.functions import vector_to_array

        scored = self.base.model.transform(df)
        return scored.withColumn(
            "margin",
            F.element_at(vector_to_array(F.col("rawPrediction")), 2).cast("double"),
        )

    def run(self, train: DataFrame, feature_cols: list[str], label_col: str = "label") -> None:
        from pyspark.ml.regression import IsotonicRegression

        # repartition small before caching: the fold window exits with one
        # shuffle-partition-count frame of tiny tasks, and LinearSVC runs
        # ~an iteration of distributed jobs over it — per-job scheduling of
        # 32 near-empty tasks dominates the actual math locally. A handful
        # of partitions keeps every fit job dense (same fix as cv.py).
        par = train.sparkSession.sparkContext.defaultParallelism
        folded = (
            stratified_kfold(train, label_col, self.k, self.seed)
            .repartition(min(par, 4))
            .cache()
        )
        fit_part = folded.filter(F.col(FOLD_COL) != 0)
        calib_part = folded.filter(F.col(FOLD_COL) == 0)

        self.base.run(fit_part, feature_cols, label_col)
        calib = self._margins(calib_part, feature_cols).select(
            F.col("margin"), F.col(label_col).cast("double").alias("y")
        )
        iso = IsotonicRegression(
            featuresCol="margin", labelCol="y", predictionCol="proba", isotonic=True
        )
        self.iso_model = iso.fit(calib)
        folded.unpersist()

    def predict_proba_df(self, df: DataFrame, feature_cols: list[str]) -> DataFrame:
        """(id, margin, proba): calibrated P(anomaly) per row, fully
        distributed (transform chain, no collect)."""
        margins = self._margins(df, feature_cols)
        out = self.iso_model.transform(margins)
        return out.select("id", "margin", F.col("proba").cast("double").alias("proba"))

    def detect(self, df: DataFrame, feature_cols: list[str]) -> DataFrame:
        scored = self.predict_proba_df(df, feature_cols)
        return scored.select(
            "id",
            F.col("proba").alias("score"),
            (F.col("proba") > F.lit(self.threshold)).cast("int").alias("predicted"),
        )
