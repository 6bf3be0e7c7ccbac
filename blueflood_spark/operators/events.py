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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MS_PER_DAY = 86_400_000


def _check_steps(steps: list[str]) -> None:
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    for s in steps:
        if not re.fullmatch(r"[A-Za-z0-9_.:-]+", s):
            raise ValueError(f"step name {s!r} is not a plain identifier")


def _user_step_times(
    events: DataFrame,
    steps: list[str],
    within_ms: int | None,
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """Per-user greedy-earliest step-completion times: one row per user
    with `acc` = array of k step timestamps (NULL where unreached). The
    shared kernel of funnel() and funnel_conversion()."""
    _check_steps(steps)
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
    return (
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
    per_user = _user_step_times(events, steps, within_ms, user_col, ts_col, type_col)
    k = len(steps)
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


def _funnel_ctes(steps: list[str], within_ms: int | None = None) -> list[str]:
    """Shared WITH-block of the iterative-min funnel formulation: CTE
    `t{i}` holds each user's step-i completion time. funnel_sql and
    funnel_conversion_sql compose these structured parts (rather than one
    slicing the other's rendered string)."""
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
    return ctes


def funnel_sql(steps: list[str], within_ms: int | None = None) -> str:
    """DuckDB twin via the independent iterative-min formulation (NOT a
    mirror of the fold) — a genuinely different derivation of the same
    semantics, so the compare checks the definition, not the code."""
    ctes = _funnel_ctes(steps, within_ms)
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


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    within_ms: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert per funnel transition: for each adjacent step pair
    (i → i+1), over the users who completed step i+1 — how many, the mean
    wait, and the exact median wait. Reuses the funnel fold (one shuffle);
    the waits are integer ms, so mean is an exact sum/count division and
    the median's interpolation is the engine-verified percentile."""
    if len(steps) < 2:
        raise ValueError("funnel_conversion needs at least 2 steps")
    # the fold is evaluated by every transition's aggregate — materialize
    # it once (at scale: a real per-user step-times table)
    per_user = _user_step_times(
        events, steps, within_ms, user_col, ts_col, type_col
    ).localCheckpoint(eager=False)
    rows = []
    for i in range(len(steps) - 1):
        wait = (F.col("acc")[i + 1] - F.col("acc")[i]).alias("wait_ms")
        seg = per_user.filter(F.col("acc")[i + 1].isNotNull()).select(wait)
        rows.append(
            seg.agg(
                F.count(F.lit(1)).alias("n_converted"),
                F.avg("wait_ms").alias("avg_wait_ms"),
                F.expr("percentile(wait_ms, 0.5D)").alias("p50_wait_ms"),
            ).select(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("from_name"),
                F.lit(steps[i + 1]).alias("to_name"),
                "n_converted",
                "avg_wait_ms",
                "p50_wait_ms",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def funnel_conversion_sql(steps: list[str], within_ms: int | None = None) -> str:
    """DuckDB twin from the iterative-min CTEs (independent derivation)."""
    if len(steps) < 2:
        raise ValueError("funnel_conversion needs at least 2 steps")
    ctes = "WITH " + ",\n".join(_funnel_ctes(steps, within_ms))
    selects = []
    for i in range(1, len(steps)):
        selects.append(
            f"SELECT {i} AS step, '{steps[i - 1]}' AS from_name,"
            f" '{steps[i]}' AS to_name, count(*) AS n_converted,"
            f" avg(t{i + 1}.ts - t{i}.ts) AS avg_wait_ms,"
            f" quantile_cont(t{i + 1}.ts - t{i}.ts, 0.5) AS p50_wait_ms"
            f" FROM t{i + 1} JOIN t{i} USING (user_id)"
        )
    return ctes + "\n" + "\nUNION ALL ".join(selects)


def top_paths(
    events: DataFrame,
    depth: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
) -> DataFrame:
    """Path analysis: each user's first `depth` event types (by time,
    ties broken by type name) joined into a path string, with user counts
    for the top-k paths. One shuffle on the user key for the per-user
    sort-and-slice, one partial-aggregated count, and the top-k plans as
    TakeOrderedAndProject — no global sort of users."""
    path = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
                    )
                ),
                lambda x: x["et"],
            ),
            1,
            depth,
        ),
        ">",
    )
    per_user = events.groupBy(user_col).agg(path.alias("path"))
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(k)
    )


def top_paths_sql(depth: int = 3, k: int = 20) -> str:
    return f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts, event_type FROM events),
per_user AS (
  SELECT user_id,
         array_to_string(list_slice(list(event_type ORDER BY ts, event_type), 1, {depth}), '>') AS path
  FROM e GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM per_user GROUP BY path
ORDER BY n_users DESC, path
LIMIT {k}
"""


def type_cooccurrence_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket lift over event types: for each unordered type pair,
    lift = P(a,b) / (P(a)·P(b)) with user-level presence probabilities —
    the association signal behind "users who error also purchase?"
    questions. Exact arithmetic: all counts are integers and lift is ONE
    IEEE division of two exact integer products, so engines agree
    bit-for-bit.

    Scale shape: dedup to (user, type) grain first (the smallest correct
    intermediate — per-user pair fan-out is then bounded by the type
    VOCABULARY k as k²/2, never by event volume), one self-equi-join on
    the user key, broadcast-sized totals joined back."""
    ue = events.select(user_col, type_col).distinct().localCheckpoint(
        eager=False  # feeds pair join (twice), totals, and the user count
    )
    a, b = ue.alias("a"), ue.alias("b")
    n_ab = (
        a.join(
            b,
            (F.col(f"a.{user_col}") == F.col(f"b.{user_col}"))
            & (F.col(f"a.{type_col}") < F.col(f"b.{type_col}")),
        )
        .groupBy(
            F.col(f"a.{type_col}").alias("et_a"), F.col(f"b.{type_col}").alias("et_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    totals = ue.groupBy(type_col).agg(F.count(F.lit(1)).alias("n"))
    n_users = ue.select(user_col).distinct().agg(F.count(F.lit(1)).alias("n_users"))
    return (
        n_ab.join(
            F.broadcast(totals.select(F.col(type_col).alias("et_a"), F.col("n").alias("n_a"))),
            "et_a",
        )
        .join(
            F.broadcast(totals.select(F.col(type_col).alias("et_b"), F.col("n").alias("n_b"))),
            "et_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "et_a", "et_b", "n_a", "n_b", "n_ab", "n_users",
            (
                (F.col("n_ab") * F.col("n_users")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def type_cooccurrence_lift_sql() -> str:
    return """
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
n_ab AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b, count(*) AS n_ab
  FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
totals AS (SELECT event_type, count(*) AS n FROM ue GROUP BY 1),
nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ue)
SELECT p.et_a, p.et_b, ta.n AS n_a, tb.n AS n_b, p.n_ab, nu.n_users,
       CAST(p.n_ab * nu.n_users AS DOUBLE) / CAST(ta.n * tb.n AS DOUBLE) AS lift
FROM n_ab p
JOIN totals ta ON ta.event_type = p.et_a
JOIN totals tb ON tb.event_type = p.et_b
CROSS JOIN nu
"""


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    within_ms: int,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Marketing-style last-touch attribution: for every conversion
    event, the most recent PRECEDING non-conversion event of the same
    user within `within_ms` — which touch gets the credit. The funnel
    answers "did the ordered steps happen"; attribution answers "what
    immediately drove each conversion".

    ONE shuffle on the user key; the credit assignment is a
    last-non-null window over the preceding frame (no per-conversion
    self-join — a join formulation re-shuffles the fact table per
    conversion type). Ordering is pinned by (ts, event id), so a touch
    sharing the conversion's exact timestamp attributes when its id
    sorts earlier — deterministic on both engines. Conversions with no
    qualifying touch keep NULL attribution (count them; don't drop)."""
    _check_steps([conversion_type])
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col) != conversion_type,
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("et")),
    )
    flagged = events.withColumn(
        "_touch", F.last(touch, ignorenulls=True).over(w)
    )
    conv = flagged.filter(F.col(type_col) == conversion_type)
    ok = F.col("_touch").isNotNull() & (
        (F.col(ts_col) - F.col("_touch.t")) <= within_ms
    )
    return conv.select(
        id_col,
        user_col,
        ts_col,
        F.when(ok, F.col("_touch.et")).alias("attributed_type"),
        F.when(ok, F.col(ts_col) - F.col("_touch.t")).alias("wait_ms"),
    )


def last_touch_attribution_sql(conversion_type: str, within_ms: int) -> str:
    _check_steps([conversion_type])
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type FROM events
),
flagged AS (
  SELECT *,
         last_value(CASE WHEN event_type <> '{conversion_type}'
                         THEN struct_pack(t := ts_ms, et := event_type) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM e
)
SELECT event_id, user_id, ts_ms,
       CASE WHEN touch IS NOT NULL AND ts_ms - touch.t <= {int(within_ms)}
            THEN touch.et END AS attributed_type,
       CASE WHEN touch IS NOT NULL AND ts_ms - touch.t <= {int(within_ms)}
            THEN ts_ms - touch.t END AS wait_ms
FROM flagged WHERE event_type = '{conversion_type}'
"""


def cohort_ltv(
    events: DataFrame,
    max_offset_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """Cohort LTV curve — retention_cohorts' value-weighted sibling: per
    (cohort day, day offset), the cohort's event value that day and the
    RUNNING cumulative (the curve a growth dashboard plots). Monetary
    values ride as exact integer CENTS (round(value·100)) so the
    order-dependent double sum that would diverge cross-engine never
    happens; /100.0 at read time is the caller's choice.

    Scale: same three user-key/cohort-grid shuffles as
    retention_cohorts plus one tiny window over the cohort grid
    (≤ cohorts × offsets rows)."""
    day = F.expr(f"{ts_col} DIV {MS_PER_DAY}").alias("day")
    cents = F.expr(f"CAST(round({value_col} * 100) AS BIGINT)").alias("cents")
    ev = events.select(F.col(user_col).alias("u"), day, cents)
    cohort = ev.groupBy("u").agg(F.min("day").alias("cohort_day"))
    cells = (
        ev.join(cohort, "u")
        .withColumn("day_offset", (F.col("day") - F.col("cohort_day")).cast("int"))
        .filter(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.count_distinct(F.col("u")).alias("n_active_users"),
            F.sum("cents").alias("cents_day"),
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.withColumn("cents_cum", F.sum("cents_day").over(w))


def cohort_ltv_sql(max_offset_days: int = 7) -> str:
    return f"""
WITH ev AS (
  SELECT user_id AS u, epoch_ms(ts) // {MS_PER_DAY} AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cohort AS (SELECT u, min(day) AS cohort_day FROM ev GROUP BY u),
cells AS (
  SELECT c.cohort_day, CAST(e.day - c.cohort_day AS INTEGER) AS day_offset,
         count(DISTINCT e.u) AS n_active_users,
         CAST(sum(e.cents) AS BIGINT) AS cents_day
  FROM ev e JOIN cohort c USING (u)
  WHERE e.day - c.cohort_day <= {int(max_offset_days)}
  GROUP BY 1, 2
)
SELECT cohort_day, day_offset, n_active_users, cents_day,
       CAST(SUM(cents_day) OVER (PARTITION BY cohort_day ORDER BY day_offset
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents_cum
FROM cells
"""
