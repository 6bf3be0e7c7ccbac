"""blueflood_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rax-maas/blueflood (time-series ingest,
rollup cascade, discovery/search, events), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for ingest, Parquet partitioned by (resolution, date)
in place of the reference's per-granularity Cassandra column families.

Reference semantics are cited per-module as /root/reference paths
(file:line); no reference code is copied — everything here is a fresh
PySpark expression of the same behavior.
"""

__version__ = "0.1.0"
