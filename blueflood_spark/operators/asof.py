"""As-of join: for every left row, the most recent right row with
right_ts <= left_ts per key — the canonical time-series enrichment
operator (join events to the latest metric sample before them).

Spark has no ASOF JOIN; the scalable composition is the union/LOCF trick:
tag both sides, sort by (key, ts, side) within key partitions, and carry
the right side's values forward with `last(..., ignorenulls=True)` over an
unbounded-preceding window — one shuffle on the key, no range explosion,
no cross join. (A naive ts-inequality join would be O(left × right) per
key; this is O((left + right) log) per partition.)

The DuckDB oracle is the native `ASOF JOIN`, so the semantics — including
the right_ts == left_ts inclusive boundary — are checked against a real
implementation rather than a mirror of our own plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Left as-of join. Right side must be unique per (on, right_ts) —
    pre-aggregate it if not. `tolerance_ms` optionally voids matches older
    than left_ts - tolerance (pandas merge_asof semantics)."""
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows sort first at equal ts → inclusive boundary
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("_r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).cast("long").alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "_ts",
        "_side",
        *[F.col(f"_l_{c}") for c in lcols],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_matched_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        too_old = F.col("_matched_ts") < F.col("_ts") - F.lit(tolerance_ms)
        out = out.select(
            *on,
            "_ts",
            *[F.col(f"_l_{c}") for c in lcols],
            *[F.when(too_old, None).otherwise(F.col(f"_r_{c}")).alias(f"_r_{c}") for c in value_cols],
            F.when(too_old, None).otherwise(F.col("_matched_ts")).alias("_matched_ts"),
        )
    return out.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in value_cols],
        F.col("_matched_ts").alias("asof_ts"),
    )
