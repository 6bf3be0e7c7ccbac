"""Metric discovery catalog + hierarchical token index (SURVEY S9/S10/A10,
F1/F2).

Replaces the reference's Elasticsearch indices:
- discovery docs {tenantId, metric_name, unit}
  (/root/reference/blueflood-elasticsearch/.../Discovery.java:22-62,
  ESFieldLabel.java:19-26, writer inputs/processors/DiscoveryWriter.java:44-150)
  → `metric_catalog` table: dropDuplicates upsert, broadcast-joined at query
  time for units enrichment (J1, RollupHandler.java:146-180).
- token index {token, parent, isLeaf}
  (ElasticTokensIO.java, types/Token.java:36-79) → `metric_tokens` derived
  view via split + posexplode; glob browse queries become rlike filters
  (AbstractElasticIO.java:286-326).

At 100 TB the catalog is tiny relative to data (distinct locators, not
samples) — it broadcasts; the token explode is linear in catalog size, not
data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueflood_spark.functions.glob import anchored, glob_to_regex, next_level_regex


def build_catalog(raw: DataFrame) -> DataFrame:
    """Distinct locators with last-seen unit (S9). One shuffle on the
    locator key; at scale this is the `foreachBatch` upsert target."""
    return (
        raw.groupBy("tenant_id", "metric_name")
        .agg(F.max_by("unit", "ts").alias("unit"))
    )


def build_tokens(catalog: DataFrame) -> DataFrame:
    """Token index: explode each dotted name into path prefixes
    (types/Token.java:36-79). For `a.b.c.d`: tokens a, b, c, d with parents
    '', a, a.b, a.b.c; only the final token is a leaf."""
    parts = F.split(F.col("metric_name"), r"\.")
    exploded = catalog.select(
        "tenant_id",
        "metric_name",
        F.posexplode(parts).alias("pos", "token"),
        F.size(parts).alias("n_tokens"),
    )
    return exploded.select(
        "tenant_id",
        "token",
        F.when(F.col("pos") == 0, F.lit("")).otherwise(
            F.concat_ws(".", F.slice(F.split(F.col("metric_name"), r"\."), 1, F.col("pos")))
        ).alias("parent"),
        F.concat_ws(
            ".", F.slice(F.split(F.col("metric_name"), r"\."), 1, F.col("pos") + 1)
        ).alias("path"),
        (F.col("pos") + 1).alias("depth"),
        (F.col("pos") == F.col("n_tokens") - 1).alias("is_leaf"),
    ).dropDuplicates(["tenant_id", "path", "is_leaf"])


def search_metrics(
    catalog: DataFrame, tenant_id: str, glob: str, include_enum_values: bool = False
) -> DataFrame:
    """`GET /v2.0/:tenantId/metrics/search?query=<glob>` (SURVEY §2.11;
    HttpMetricsIndexHandler.java:40-60): full-name glob match, deduped.

    include_enum_values (r5 audit): the reference AT THIS VERSION has no
    enum-metrics surface at all — SearchResult.java:24-43 carries only
    (tenant, name, unit) and ESFieldLabel.java:19-26 defines no enum
    field; the param existed only in other/later Blueflood lines. It is
    kept as a compatibility flag for callers of those lines: the
    response gains an `enum_values` column that is always an empty array
    (this engine ingests no enum type). Documented as dropped-deprecated
    in README's coverage table — the API shape is served, the dead
    feature is not."""
    regex = anchored(glob_to_regex(glob))
    out = (
        catalog.filter(F.col("tenant_id") == tenant_id)
        .filter(F.col("metric_name").rlike(regex))
        .select("tenant_id", "metric_name", "unit")
        .dropDuplicates(["tenant_id", "metric_name"])
    )
    if include_enum_values:
        out = out.withColumn("enum_values", F.array().cast("array<string>"))
    return out


def search_metric_names(catalog: DataFrame, tenant_id: str, glob: str) -> DataFrame:
    """`GET /v2.0/:tenantId/metric_name/search?query=<glob>` token browse
    (HttpMetricNamesHandler.java:50-106, AbstractElasticIO.java:136-185):
    returns names at the query's depth plus one, with is_leaf flags.

    For metrics foo.bar.xxx & foo.bar.baz.qux and query=foo.bar.*:
    → (foo.bar.xxx, leaf), (foo.bar.baz, non-leaf).
    """
    regex = anchored(next_level_regex(glob))
    base_level = len(glob.split("."))
    matched = (
        catalog.filter(F.col("tenant_id") == tenant_id)
        .filter(F.col("metric_name").rlike(regex))
        .select("metric_name")
    )
    parts = F.split(F.col("metric_name"), r"\.")
    truncated = matched.select(
        F.concat_ws(".", F.slice(parts, 1, base_level)).alias("name"),
        (F.size(parts) == base_level).alias("is_complete"),
    )
    # a truncated name is a leaf iff a complete metric exists at base level;
    # it has a next level iff some metric extends past base level
    return (
        truncated.groupBy("name")
        .agg(
            F.max(F.when(F.col("is_complete"), 1).otherwise(0)).alias("has_complete"),
            F.max(F.when(~F.col("is_complete"), 1).otherwise(0)).alias("has_next"),
        )
        .select(
            F.col("name").alias("metric_name"),
            (F.col("has_complete") == 1).alias("is_leaf"),
            (F.col("has_next") == 1).alias("has_next_level"),
        )
    )
