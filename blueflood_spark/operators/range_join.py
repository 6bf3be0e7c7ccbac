"""Range (interval) join: left rows matched to right intervals
[start, end] sharing a key — points-in-interval enrichment.

Spark's naive plan for `l.ts BETWEEN r.start AND r.end` with only
inequality predicates is a broadcast-nested-loop (O(L×R) per key). The
scalable composition here is BUCKETIZATION: each right interval explodes
into the fixed-width buckets it overlaps, the left row computes its one
bucket, and the join becomes an equi-join on (key, bucket) + a residual
refine predicate. Each (left, right) pair meets in exactly the bucket
containing left.ts, so no dedup pass is needed. Cost is
O(L + R·span/width + matches); pick `bucket_ms` near the typical interval
length so intervals explode into O(1) buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Inner join of left rows to right intervals with
    right_start <= left_ts <= right_end (per `on` key). Output carries all
    columns of both sides (right's prefixed `r_` on collision)."""
    on = list(on)
    l_bucket = (F.col(left_ts) / bucket_ms).cast("long").alias("_bucket")
    l_tagged = left.select(*left.columns, l_bucket)
    rename = {
        c: (f"r_{c}" if c in left.columns and c not in on else c)
        for c in right.columns
    }
    r_buckets = F.sequence(
        (F.col(right_start) / bucket_ms).cast("long"),
        (F.col(right_end) / bucket_ms).cast("long"),
    )
    r_tagged = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns],
        F.explode(r_buckets).alias("_bucket"),
    )
    rs, re = rename[right_start], rename[right_end]
    return (
        l_tagged.join(r_tagged, [*on, "_bucket"])
        .filter((F.col(left_ts) >= F.col(rs)) & (F.col(left_ts) <= F.col(re)))
        .drop("_bucket")
    )
