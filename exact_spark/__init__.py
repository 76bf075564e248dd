"""exact_spark — a PySpark-native analytics engine with the capabilities of
TedBoman/EXACT (time-series anomaly analytics), rebuilt Spark-first.

Layout:
    session    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
    io         — testdata table loaders
    sources/   — ingest + canonicalization + job-table catalog (SURVEY §2.1)
    operators/ — relational / time-series / injection / dedup / text /
                 similarity operators (SURVEY §2.2-2.6 + scale extensions)
    functions/ — reusable column expression helpers
    plans/     — job orchestration (run_batch pipeline, run summary)
    ml/        — detection models (SURVEY §2.7)
    streaming/ — structured-streaming replay + scoring (SURVEY §2.9)
"""

__version__ = "0.1.0"
