"""ra2_datalake_linaresjoan_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``JoanLinares/RA2_Datalake_LinaresJoan``
(a medallion Bronze→Silver→Gold datalake for Polymarket data), extended with
LLM-training-data pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Everything is the lazy ``pyspark.sql.DataFrame`` API: operators take and
return DataFrames, expressions are ``Column -> Column`` builders, and the
only actions are sinks — so Catalyst gets the whole plan (pushdown, pruning,
broadcast, AQE) for free.

Layout:
- ``session``    — SparkSession builder with scale-aware defaults
- ``functions``  — expression library (normalizers, parsers, classifiers,
                   calendar) mirroring SURVEY.md §2.8 semantics
- ``operators``  — relational ops: dedup, filters, joins, aggregates, top-k
- ``sources``    — readers/writers (parquet/csv/json/delta-gated/jdbc/REST)
- ``plans``      — medallion pipelines, gold star-schema builder, validator
- ``streaming``  — Structured Streaming surface over the events stream
- ``llmdata``    — dedup (exact/MinHash-LSH/SimHash/Jaccard), ANN similarity,
                   text analysis, multimodal column plumbing
"""

from ra2_datalake_linaresjoan_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
