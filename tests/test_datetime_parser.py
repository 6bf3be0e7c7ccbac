"""Date/time parser cases mirroring DateTimeParserTest.java (reference:
blueflood-http .../utils/DateTimeParserTest.java)."""

from datetime import datetime

from blueflood_spark.functions.datetime_parser import parse_datetime

NOW = datetime(2024, 3, 14, 10, 37, 45, 123000)  # a Thursday
REF = NOW.replace(second=0, microsecond=0)
MIDNIGHT = REF.replace(hour=0, minute=0)


def test_unix_timestamp():
    ts = int(NOW.timestamp())
    assert parse_datetime(str(ts), NOW) == datetime.fromtimestamp(ts)


def test_plain_time_date_format():
    for s in ("10:55 2014 12 20", "10:55_2014_12_20"):
        assert parse_datetime(s, NOW) == datetime(2014, 12, 20, 10, 55)


def test_now_keyword():
    assert parse_datetime("now", NOW) == REF


def test_hour_minute():
    assert parse_datetime("12:24", NOW) == MIDNIGHT.replace(hour=12, minute=24)
    assert parse_datetime("9:13am", NOW) == MIDNIGHT.replace(hour=9, minute=13)
    assert parse_datetime("09:13pm", NOW) == MIDNIGHT.replace(hour=21, minute=13)


def test_hour_minute_keywords():
    assert parse_datetime("noon", NOW) == MIDNIGHT.replace(hour=12)
    assert parse_datetime("teatime", NOW) == MIDNIGHT.replace(hour=16)
    assert parse_datetime("midnight", NOW) == MIDNIGHT


def test_day_keywords():
    # reference semantics: bare day keywords keep hour=minute=0
    assert parse_datetime("today", NOW) == MIDNIGHT
    assert parse_datetime("yesterday", NOW) == MIDNIGHT.replace(day=13)
    assert parse_datetime("tomorrow", NOW) == MIDNIGHT.replace(day=15)


def test_date_formats():
    assert parse_datetime("12/30/14", NOW) == datetime(2014, 12, 30)
    assert parse_datetime("12/30/2014", NOW) == datetime(2014, 12, 30)
    assert parse_datetime("Jul 30", NOW) == datetime(2024, 7, 30)
    assert parse_datetime("Jul 30, 2013", NOW) == datetime(2013, 7, 30)
    assert parse_datetime("20141230", NOW) == datetime(2014, 12, 30)


def test_day_of_week():
    # most recent Friday before Thursday 2024-03-14 is 2024-03-08
    assert parse_datetime("Fri", NOW) == datetime(2024, 3, 8)
    assert parse_datetime("14:42 Fri", NOW) == datetime(2024, 3, 8, 14, 42)
    assert parse_datetime("noon Fri", NOW) == datetime(2024, 3, 8, 12, 0)


def test_offsets():
    assert parse_datetime("now-3h", NOW) == REF.replace(hour=7)
    assert parse_datetime("now+2d", NOW) == REF.replace(day=16)
    assert parse_datetime("now-10min", NOW) == REF.replace(minute=27)
    assert parse_datetime("today-1mon", NOW) == MIDNIGHT.replace(month=2)
    assert parse_datetime("now-1y", NOW) == REF.replace(year=2023)
    assert parse_datetime("12:00 12/30/14 + 25s", NOW) == datetime(2014, 12, 30, 12, 0, 25)


def test_month_year_offsets_clamp_end_of_month():
    from datetime import datetime

    from blueflood_spark.functions.datetime_parser import parse_datetime

    # Jan 31 + 1 month → Feb 28 (Joda plusMonths clamp), not ValueError
    now = datetime(2023, 1, 31, 12, 0)
    assert parse_datetime("now+1mon", now) == datetime(2023, 2, 28, 12, 0)
    # leap-day + 1 year → Feb 28
    now = datetime(2024, 2, 29, 9, 30)
    assert parse_datetime("now+1y", now) == datetime(2025, 2, 28, 9, 30)
