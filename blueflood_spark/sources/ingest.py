"""Ingest normalization + validation (SURVEY §2.1 S1-S4, §2.2 P1/P2/P5).

The reference's HTTP ingest pipeline (Netty handler → Jackson bean
validation → partial-accept with per-row errors,
/root/reference/blueflood-http/.../HttpMetricsIngestionHandler.java:104-220,
inputs/formats/JSONMetric.java:28-41,
inputs/constraints/EpochRangeValidator.java) becomes a pure DataFrame
stage: parse fixed-schema JSON → annotate an `error` column → split into
(valid, rejected). The same transform serves batch backfill and
Structured Streaming (it is used inside streaming/pipeline.py), which is
exactly how the reference reuses its ingest path for Cloud Files replay.

Statsd aggregated payloads (HttpAggregatedIngestionHandler /
PreaggregateConversions.java:48-129) normalize here too: one
explode+select per family, unioned into the PREAGG_METRICS shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blueflood_spark.schemas import PREAGG_METRICS, RAW_METRICS

# EpochRangeValidator tolerances (reference CoreConfig BEFORE_CURRENT_COLLECTIONTIME_MS /
# AFTER_CURRENT_COLLECTIONTIME_MS defaults: 3 days past, 10 minutes future)
MAX_AGE_MS = 3 * 86_400_000
MAX_FUTURE_MS = 600_000
MAX_TTL = 2**31 - 1

# JSON array-of-samples payload for POST /v2.0/:tenantId/ingest
INGEST_PAYLOAD = T.StructType(
    [
        T.StructField("tenantId", T.StringType(), True),  # multi-tenant variant carries it per-row
        T.StructField("metricName", T.StringType(), True),
        T.StructField("metricValue", T.DoubleType(), True),
        T.StructField("collectionTime", T.LongType(), True),
        T.StructField("ttlInSeconds", T.IntegerType(), True),
        T.StructField("unit", T.StringType(), True),
    ]
)


def parse_ingest_json(spark, path_or_df, tenant_id: str | None = None) -> DataFrame:
    """Read an ingest payload (file of JSON lines) with the fixed schema —
    no inference, so a malformed field nulls out and is caught by
    validation rather than corrupting the schema."""
    df = (
        spark.read.schema(INGEST_PAYLOAD).json(path_or_df)
        if isinstance(path_or_df, str)
        else path_or_df
    )
    tenant = F.coalesce(F.col("tenantId"), F.lit(tenant_id))
    return df.select(
        tenant.alias("tenant_id"),
        F.col("metricName").alias("metric_name"),
        F.col("collectionTime").alias("ts"),
        F.col("metricValue").alias("value"),
        F.col("unit"),
        F.col("ttlInSeconds").alias("ttl_seconds"),
    )


def validate(raw: DataFrame, now_ms: int) -> tuple[DataFrame, DataFrame]:
    """P1 payload validation: returns (valid, rejected-with-error).

    Mirrors JSONMetric bean constraints: non-empty metricName, TTL in
    [1, 2^31), collectionTime within [now - maxPast, now + maxFuture].
    Partial-accept semantics (the "207" response) = the split itself.
    """
    err = (
        F.when(F.col("tenant_id").isNull() | (F.length("tenant_id") == 0), "missing tenantId")
        .when(F.col("metric_name").isNull() | (F.length("metric_name") == 0), "missing metricName")
        .when(F.col("value").isNull(), "missing metricValue")
        # the reference rejects non-finite values implicitly (strict JSON
        # has no NaN/Infinity literal); batch backfill frames bypass the
        # JSON layer, so the rule must live here — a NaN reaching a
        # rollup poisons every downstream min/max/avg differently per
        # engine (Spark sorts NaN last, DuckDB first)
        .when(
            F.isnan("value") | (F.abs("value") == float("inf")),
            "non-finite metricValue",
        )
        .when(F.col("ts").isNull(), "missing collectionTime")
        .when(F.col("ts") < F.lit(now_ms - MAX_AGE_MS), "collectionTime too far in the past")
        .when(F.col("ts") > F.lit(now_ms + MAX_FUTURE_MS), "collectionTime too far in the future")
        .when(
            F.col("ttl_seconds").isNotNull()
            & ((F.col("ttl_seconds") < 1) | (F.col("ttl_seconds") > MAX_TTL)),
            "ttlInSeconds out of range",
        )
        .otherwise(F.lit(None).cast("string"))
    )
    annotated = raw.withColumn("error", err)
    valid = annotated.filter(F.col("error").isNull()).drop("error")
    rejected = annotated.filter(F.col("error").isNotNull())
    return valid, rejected


def force_ttls(valid: DataFrame, configured_ttl: int | None) -> DataFrame:
    """P5 TTL force/override (HttpMetricsIngestionHandler
    forceTTLsIfConfigured, service/TtlConfig.java:20-52)."""
    if configured_ttl is None:
        return valid.withColumn("ttl_seconds", F.coalesce(F.col("ttl_seconds"), F.lit(None)))
    return valid.withColumn("ttl_seconds", F.lit(configured_ttl).cast("int"))


def flag_delayed(valid: DataFrame, now_ms: int, rollup_delay_ms: int = 300_000) -> DataFrame:
    """P2 delayed-metric predicate (JSONMetricsContainer.isDelayed;
    ROLLUP_DELAY_MILLIS default 300000, CoreConfig.java:222)."""
    return valid.withColumn("is_delayed", F.col("ts") < F.lit(now_ms - rollup_delay_ms))


# ---------------------------------------------------------------------------
# statsd aggregated payload → PREAGG_METRICS rows
# ---------------------------------------------------------------------------

AGGREGATED_PAYLOAD = T.StructType(
    [
        T.StructField("tenantId", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("flushInterval", T.LongType(), True),
        T.StructField(
            "counters",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.DoubleType()),
                        T.StructField("rate", T.DoubleType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "gauges",
            T.ArrayType(
                T.StructType(
                    [T.StructField("name", T.StringType()), T.StructField("value", T.DoubleType())]
                )
            ),
            True,
        ),
        T.StructField(
            "timers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("count", T.LongType()),
                        T.StructField("rate", T.DoubleType()),
                        T.StructField("min", T.DoubleType()),
                        T.StructField("max", T.DoubleType()),
                        T.StructField("sum", T.DoubleType()),
                        T.StructField("avg", T.DoubleType()),
                        T.StructField("std", T.DoubleType()),
                        T.StructField(
                            "percentiles",
                            T.MapType(
                                T.StringType(),
                                T.StructType([T.StructField("avg", T.DoubleType())]),
                            ),
                        ),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "sets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("values", T.ArrayType(T.StringType())),
                    ]
                )
            ),
            True,
        ),
    ]
)


def normalize_aggregated(payloads: DataFrame) -> DataFrame:
    """S3: one explode per family, unionByName into PREAGG_METRICS.

    Counter sampleCount derivation (PreaggregateConversions.java:61-64):
    flushInterval > 0 → rate * flushInterval/1000, else 1.
    Timer variance = std² (:104); timer null fields default 0; percentile
    entries keep only `avg` (max/sum thrown away, :108-112).
    """
    base = [F.col("tenantId").alias("tenant_id"), F.col("timestamp").alias("ts")]
    nulls = {f.name: F.lit(None).cast(f.dataType) for f in PREAGG_METRICS.fields}

    def shaped(cols: dict) -> list:
        out = []
        for f in PREAGG_METRICS.fields:
            out.append(cols.get(f.name, nulls[f.name]).alias(f.name))
        return out

    counters = payloads.select(*base, F.col("flushInterval"), F.explode("counters").alias("c")).select(
        *shaped(
            {
                "tenant_id": F.col("tenant_id"),
                "metric_name": F.col("c.name"),
                "ts": F.col("ts"),
                "rollup_type": F.lit("counter"),
                "counter_value": F.col("c.value"),
                "counter_rate": F.col("c.rate"),
                "flush_interval_ms": F.coalesce(F.col("flushInterval"), F.lit(0)),
            }
        )
    )
    gauges = payloads.select(*base, F.explode("gauges").alias("g")).select(
        *shaped(
            {
                "tenant_id": F.col("tenant_id"),
                "metric_name": F.col("g.name"),
                "ts": F.col("ts"),
                "rollup_type": F.lit("gauge"),
                "gauge_value": F.col("g.value"),
            }
        )
    )
    timers = payloads.select(*base, F.explode("timers").alias("t")).select(
        *shaped(
            {
                "tenant_id": F.col("tenant_id"),
                "metric_name": F.col("t.name"),
                "ts": F.col("ts"),
                "rollup_type": F.lit("timer"),
                "timer_count": F.col("t.count"),
                "timer_sum": F.coalesce(F.col("t.sum"), F.lit(0.0)),
                "timer_rate": F.coalesce(F.col("t.rate"), F.lit(0.0)),
                "timer_min": F.coalesce(F.col("t.min"), F.lit(0.0)),
                "timer_max": F.coalesce(F.col("t.max"), F.lit(0.0)),
                "timer_avg": F.coalesce(F.col("t.avg"), F.lit(0.0)),
                "timer_std": F.coalesce(F.col("t.std"), F.lit(0.0)),
                "timer_percentiles": F.map_from_entries(
                    F.filter(
                        F.transform(
                            F.map_entries(F.col("t.percentiles")),
                            lambda e: F.struct(e["key"].alias("key"), e["value"]["avg"].alias("value")),
                        ),
                        lambda e: e["value"].isNotNull(),
                    )
                ),
            }
        )
    )
    sets = payloads.select(*base, F.explode("sets").alias("s")).select(
        *shaped(
            {
                "tenant_id": F.col("tenant_id"),
                "metric_name": F.col("s.name"),
                "ts": F.col("ts"),
                "rollup_type": F.lit("set"),
                "set_values": F.col("s.values"),
            }
        )
    )
    out = counters.unionByName(gauges).unionByName(timers).unionByName(sets)
    # counter sampleCount: rate * flushInterval/1000 when flush > 0, else 1
    return out.withColumn(
        "sample_count",
        F.when(
            (F.col("rollup_type") == "counter") & (F.col("flush_interval_ms") > 0),
            (F.col("counter_rate") * F.col("flush_interval_ms") / 1000.0).cast("long"),
        ).when(F.col("rollup_type") == "counter", F.lit(1).cast("long")),
    )


def route_by_type(preagg: DataFrame) -> dict[str, DataFrame]:
    """P4 rollup-type router (MetricsRWDelegator.java:79-113): split the
    normalized stream per family — in storage this is a partition column,
    so the "routing" costs one predicate, no shuffle."""
    return {
        t: preagg.filter(F.col("rollup_type") == t) for t in ("counter", "gauge", "timer", "set")
    }
