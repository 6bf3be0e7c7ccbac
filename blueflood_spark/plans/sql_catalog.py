"""SQL surface: register the engine's tables as temp views so users can
query with plain `spark.sql(...)` — Catalyst produces the same plans as
the DataFrame API, so everything (pruning, pushdown, broadcast) carries
over. This is the "switchover" surface for users who want SQL instead of
the reference's HTTP endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(
    spark: SparkSession,
    raw_path: str | None = None,
    rollups_path: str | None = None,
    events_path: str | None = None,
    raw_df: DataFrame | None = None,
    rollups_df: DataFrame | None = None,
    events_df: DataFrame | None = None,
) -> list[str]:
    """Create raw_metrics / rollups / events temp views (from paths or
    DataFrames) plus derived metric_catalog and metric_tokens views."""
    from blueflood_spark.catalog import build_catalog, build_tokens

    created = []
    raw = raw_df if raw_df is not None else (spark.read.parquet(raw_path) if raw_path else None)
    if raw is not None:
        raw.createOrReplaceTempView("raw_metrics")
        created.append("raw_metrics")
        if "unit" not in raw.columns:
            from pyspark.sql import functions as F

            raw = raw.withColumn("unit", F.lit(None).cast("string"))
        cat = build_catalog(raw)
        cat.createOrReplaceTempView("metric_catalog")
        build_tokens(cat).createOrReplaceTempView("metric_tokens")
        created += ["metric_catalog", "metric_tokens"]
    roll = rollups_df if rollups_df is not None else (
        spark.read.parquet(rollups_path) if rollups_path else None
    )
    if roll is not None:
        roll.createOrReplaceTempView("rollups")
        created.append("rollups")
    ev = events_df if events_df is not None else (
        spark.read.parquet(events_path) if events_path else None
    )
    if ev is not None:
        ev.createOrReplaceTempView("events")
        created.append("events")
    return created
