"""Behavioral-analytics operators over the events stream: ordered funnel
and cohort retention. The reference engine stops at raw event range/tag
queries (`EventElasticSearchIO.java:60-100` — see plans/events_api.py);
these are the aggregate shapes a warehouse user derives from that same
table, expressed Spark-first.

Scale shapes:
- `funnel`: ONE shuffle of the (step-type-pruned) events on the user key,
  then a per-user sorted fold entirely inside codegen (`array_sort` +
  `aggregate` on the collected struct list). No per-step self-joins — a
  k-step funnel as k joins would shuffle the fact table k times. Per-user
  event lists are bounded by per-user activity, which is the natural
  partition grain for behavioral data; a pathological single user would
  need the same data co-located under ANY correct funnel definition.
- `retention_cohorts`: dedup to (user, day) grain first — the smallest
  correct intermediate — then min-day cohort assignment and one count per
  (cohort, offset) cell. All three shuffles are on the user key or the
  already-tiny cohort grid.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MS_PER_DAY = 86_400_000


def funnel(
    events: DataFrame,
    steps: list[str],
    within_ms: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy-earliest ordered funnel: per user, step 1 completes at the
    earliest step-1 event, and step i at the earliest step-i event
    STRICTLY after step i-1's completion (all steps within `within_ms` of
    step 1 when set). Returns one row per step: (step, step_name,
    n_users) with n_users = users reaching that step.

    Greedy-earliest equals the iterative-min definition (t_i = min ts of
    step i with ts > t_{i-1}): the fold scans events in ascending ts, so
    each slot is first set at exactly that minimum. Step names must be
    distinct (one event can satisfy at most one slot).
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    for s in steps:
        if not re.fullmatch(r"[A-Za-z0-9_.:-]+", s):
            raise ValueError(f"step name {s!r} is not a plain identifier")
    k = len(steps)
    steps_arr = "array(" + ", ".join(f"'{s}'" for s in steps) + ")"
    within = (
        f" AND (i = 0 OR e.ts <= element_at(acc, 1) + {int(within_ms)}L)"
        if within_ms is not None
        else ""
    )
    fold = F.expr(
        f"""
        aggregate(
          evs,
          array_repeat(CAST(NULL AS BIGINT), {k}),
          (acc, e) -> transform(acc, (t, i) ->
            CASE WHEN t IS NULL
                  AND e.et = element_at({steps_arr}, i + 1)
                  AND (i = 0 OR (element_at(acc, i) IS NOT NULL
                                 AND e.ts > element_at(acc, i))){within}
            THEN e.ts ELSE t END)
        )
        """
    )
    per_user = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
                )
            ).alias("evs")
        )
        .select(fold.alias("acc"))
    )
    counts = per_user.select(
        *[
            # coalesce: an aggregate over ZERO users sums to NULL, but the
            # funnel's answer is 0 (the SQL twin's count(*) agrees)
            F.coalesce(
                F.sum(F.when(F.col("acc")[i].isNotNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"_s{i}")
            for i in range(k)
        ]
    )
    step_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"),
                F.col(f"_s{i}").alias("n_users"),
            )
            for i in range(k)
        ]
    )
    return counts.select(F.explode(step_rows).alias("r")).select("r.*")


def funnel_sql(steps: list[str], within_ms: int | None = None) -> str:
    """DuckDB twin via the independent iterative-min formulation (NOT a
    mirror of the fold) — a genuinely different derivation of the same
    semantics, so the compare checks the definition, not the code."""
    for s in steps:
        if not re.fullmatch(r"[A-Za-z0-9_.:-]+", s):
            raise ValueError(f"step name {s!r} is not a plain identifier")
    ctes = ["e AS (SELECT user_id, epoch_ms(ts) AS ts, event_type FROM events)"]
    prev = None
    for i, s in enumerate(steps, start=1):
        if prev is None:
            ctes.append(
                f"t1 AS (SELECT user_id, min(ts) AS ts FROM e"
                f" WHERE event_type = '{s}' GROUP BY 1)"
            )
        else:
            cap = f" AND e.ts <= t1.ts + {int(within_ms)}" if within_ms is not None else ""
            join_t1 = (
                " JOIN t1 USING (user_id)" if within_ms is not None and prev != "t1" else ""
            )
            ctes.append(
                f"t{i} AS (SELECT e.user_id, min(e.ts) AS ts FROM e"
                f" JOIN {prev} USING (user_id){join_t1}"
                f" WHERE e.event_type = '{s}' AND e.ts > {prev}.ts{cap} GROUP BY 1)"
            )
        prev = f"t{i}"
    selects = [
        f"SELECT {i} AS step, '{s}' AS step_name, count(*) AS n_users FROM t{i}"
        for i, s in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def retention_cohorts(
    events: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Classic retention triangle: cohort = each user's first active epoch
    day; one row per (cohort_day, day_offset ∈ [0, max]) with the count
    of cohort users active on that offset day. Day 0 row = cohort size.
    All-integer output (epoch days), so the compare is exact."""
    day = F.expr(f"{ts_col} DIV {MS_PER_DAY}").alias("day")
    active = events.select(F.col(user_col).alias("u"), day).distinct()
    cohort = active.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(cohort, "u")
        .withColumn("day_offset", (F.col("day") - F.col("cohort_day")).cast("int"))
        .filter(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_cohorts_sql(max_offset_days: int = 7) -> str:
    return f"""
WITH active AS (
  SELECT DISTINCT user_id AS u, epoch_ms(ts) // {MS_PER_DAY} AS day FROM events
),
cohort AS (SELECT u, min(day) AS cohort_day FROM active GROUP BY u)
SELECT c.cohort_day, CAST(a.day - c.cohort_day AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM active a JOIN cohort c USING (u)
WHERE a.day - c.cohort_day <= {int(max_offset_days)}
GROUP BY 1, 2
"""
