"""nbi_oedi_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL system (Grant-NBI/nbi-oedi-etl).

The reference (surveyed in SURVEY.md) is a single-node asyncio+multiprocessing
pipeline whose core capabilities are:

- hive-partitioned parquet scan with partition pruning (fetch.py:40-158)
- hourly resampling of 15-min time series via group-by aggregation
  (transform.py:19-122)
- parquet sink with snappy compression (transform.py:151-154)
- metadata bypass copy (fetch.py:161-196)
- three Athena analytic queries: join + COUNT DISTINCT, grouped COUNT
  DISTINCT, ROW_NUMBER top-k-per-group (sql/saved-queries.sql)
- stage counters + listed-vs-uploaded reconciliation (monitor.py:87-136)

This engine re-expresses all of that Spark-first (DataFrame/SQL, Catalyst,
Structured Streaming) and extends it with large-scale training-data pipeline
operators: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, and multimodal column plumbing.
"""

from nbi_oedi_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
