"""Fixed StructType schemas for the engine's tables.

The reference has no user DDL; schemas are code-defined (SURVEY §1.4).
Mapping (SURVEY §1.1-§1.3):

- Locator (reference: blueflood-core .../types/Locator.java:25-55) becomes
  two columns (tenant_id, metric_name) — never a composite string.
- Metric raw sample (types/Metric.java:28-62) → RAW_METRICS.
- PreaggregatedMetric (types/PreaggregatedMetric.java;
  blueflood-http .../PreaggregateConversions.java:48-129) → PREAGG_METRICS
  with a rollup_type discriminator.
- Rollup families (types/BasicRollup.java:26-60, BluefloodTimerRollup.java:29-47,
  BluefloodCounterRollup.java, BluefloodGaugeRollup.java:26-62,
  BluefloodSetRollup.java:30-43) → ROLLUPS, one wide nullable schema with
  rollup_type discriminator (columnar nulls are ~free in Parquet).
- Event (types/Event.java:27-50) → EVENTS.
- Discovery/metadata (blueflood-elasticsearch .../ESFieldLabel.java:19-26,
  io/CassandraModel.java:61-63) → METRIC_CATALOG.
- Token index (types/Token.java:36-79) → METRIC_TOKENS.

Physical layout at scale: parquet partitioned by (resolution, date) —
partition pruning replaces the reference's per-granularity column-family
dispatch (io/CassandraModel.java:28-86).
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_METRICS = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),  # collection time, epoch ms
        T.StructField("value", T.DoubleType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("ttl_seconds", T.IntegerType(), True),
    ]
)

# statsd-style preaggregated ingest, normalized (one row per metric+type)
PREAGG_METRICS = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("rollup_type", T.StringType(), False),  # counter|gauge|timer|set
        T.StructField("counter_value", T.DoubleType(), True),
        T.StructField("counter_rate", T.DoubleType(), True),
        T.StructField("flush_interval_ms", T.LongType(), True),
        T.StructField("gauge_value", T.DoubleType(), True),
        T.StructField("timer_count", T.LongType(), True),
        T.StructField("timer_sum", T.DoubleType(), True),
        T.StructField("timer_rate", T.DoubleType(), True),
        T.StructField("timer_min", T.DoubleType(), True),
        T.StructField("timer_max", T.DoubleType(), True),
        T.StructField("timer_avg", T.DoubleType(), True),
        T.StructField("timer_std", T.DoubleType(), True),
        T.StructField("timer_percentiles", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("set_values", T.ArrayType(T.StringType()), True),
    ]
)

# One wide rollup schema; nullable per-family fields, discriminated by rollup_type.
ROLLUPS = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("resolution", T.StringType(), False),  # 5m|20m|60m|240m|1440m
        T.StructField("window_start", T.LongType(), False),  # epoch ms, snapped
        T.StructField("rollup_type", T.StringType(), False),  # basic|timer|counter|gauge|set
        T.StructField("num_points", T.LongType(), True),
        T.StructField("sum", T.DoubleType(), True),
        # Σx² raw moment: carried so coarser merges pool variance exactly
        # (see operators/rollup.basic_merge) instead of recomposing from
        # (avg, var) with catastrophic cancellation.
        T.StructField("sum_sq", T.DoubleType(), True),
        T.StructField("avg", T.DoubleType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("var_pop", T.DoubleType(), True),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("sample_count", T.LongType(), True),
        T.StructField("latest_ts", T.LongType(), True),
        T.StructField("latest_value", T.DoubleType(), True),
        T.StructField("percentiles", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("distinct_count", T.LongType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("when", T.LongType(), False),  # epoch seconds (reference divides ms by 1000)
        T.StructField("what", T.StringType(), False),
        T.StructField("data", T.StringType(), True),
        T.StructField("tags", T.StringType(), True),
    ]
)

METRIC_CATALOG = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("unit", T.StringType(), True),
        T.StructField("rollup_type", T.StringType(), True),
    ]
)

METRIC_TOKENS = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("parent", T.StringType(), True),  # dotted path of ancestors
        T.StructField("path", T.StringType(), False),  # parent + token
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("is_leaf", T.BooleanType(), False),
    ]
)
