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
    # the matched right row travels as ONE struct: `last(..., ignorenulls)`
    # then skips only rows with NO right side, never a right row whose
    # VALUE happens to be NULL — per-column carries could pair an older
    # row's value with a newer row's asof_ts (and with several value
    # columns, mix columns from different right rows)
    r_struct_type = (
        "struct<_mts:bigint,"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
        + ">"
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows sort first at equal ts → inclusive boundary
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r_row"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.struct(
            F.col(right_ts).cast("long").alias("_mts"),
            *[F.col(c) for c in value_cols],
        ).alias("_r_row"),
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
        F.last("_r_row", ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.filter(F.col("_side") == 1)
    matched = F.col("_m")
    if tolerance_ms is not None:
        too_old = F.col("_m")["_mts"] < F.col("_ts") - F.lit(tolerance_ms)
        matched = F.when(too_old, F.lit(None).cast(r_struct_type)).otherwise(F.col("_m"))
        out = out.withColumn("_m", matched)
    return out.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_m")[c].alias(f"asof_{c}") for c in value_cols],
        F.col("_m")["_mts"].alias("asof_ts"),
    )
