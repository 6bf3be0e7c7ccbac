"""Rollup-on-read repair (SURVEY A8): at query time, compute missing
rollup windows from raw data and union them with stored rollups.

Reference: /root/reference/blueflood-http/.../RollupHandler.java:241-297
(gap detection at left/right/whole range), :312-409 (parallel repair per
range), :426-441 (type dispatch). There the repair is a driver-side loop
fetching ranges on an executor pool; here it is ONE declarative plan —
an anti-join picks the missing (series, window) pairs and a windowed
aggregation over raw fills exactly those, so Catalyst parallelizes and
prunes instead of hand-built thread pools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R


def repair_on_read(
    stored: DataFrame,
    raw: DataFrame,
    gran: G.Granularity,
    from_ms: int,
    to_ms: int,
) -> DataFrame:
    """Union stored rollups with on-the-fly rollups for windows that are
    missing in storage (per series). Both sides pruned to [from, to).

    stored: ROLLUPS-shaped (basic fields); raw: RAW_METRICS-shaped.
    """
    lo = gran.snap_millis(from_ms)
    stored_in = stored.filter(
        (F.col("resolution") == gran.name)
        & (F.col("window_start") >= lo)
        & (F.col("window_start") < to_ms)
    )
    raw_in = raw.filter((F.col("ts") >= lo) & (F.col("ts") < to_ms))
    fresh = R.basic_from_raw(raw_in, gran)
    # anti-join: keep only freshly-computed windows not already stored
    missing = fresh.join(
        stored_in.select("tenant_id", "metric_name", "window_start"),
        ["tenant_id", "metric_name", "window_start"],
        "left_anti",
    ).withColumn("source", F.lit("repaired"))
    kept = stored_in.select(*missing.columns[:-1]).withColumn("source", F.lit("stored"))
    return kept.unionByName(missing)
