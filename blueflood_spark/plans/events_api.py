"""Events query endpoint (SURVEY §2.11):
`GET /v2.0/:tenantId/events/getEvents?from&until[&tags]`.

Reference: /root/reference/blueflood-http/.../HttpEventsQueryHandler.java:
45-75 — from/until accept the human date grammar (DateTimeParser, F3) and
are converted to epoch SECONDS at the query boundary (:72-75); the tags
parameter is an exact term filter (EventElasticSearchIO.java:60-100).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueflood_spark.functions.datetime_parser import parse_datetime


def get_events(
    events: DataFrame,
    tenant_id: str,
    from_str: str | None = None,
    until_str: str | None = None,
    tags: str | None = None,
    now: datetime | None = None,
) -> DataFrame:
    """Filter the events table (schemas.EVENTS: when is epoch seconds) by
    tenant, parsed time range, and optional exact tag match."""
    df = events.filter(F.col("tenant_id") == tenant_id)
    if from_str:
        df = df.filter(F.col("when") >= int(parse_datetime(from_str, now).timestamp()))
    if until_str:
        df = df.filter(F.col("when") < int(parse_datetime(until_str, now).timestamp()))
    if tags:
        # reference tags filter is a term match on the tags field
        df = df.filter(F.col("tags").isNotNull() & (F.col("tags") == tags))
    return df.orderBy("when")
