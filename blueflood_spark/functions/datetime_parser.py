"""Human date/time parser for query `from`/`until` parameters.

Python re-expression of the reference parser
(/root/reference/blueflood-http/.../utils/DateTimeParser.java:28-199):
accepts raw epoch seconds, "HH:mm YYYYMMDD", "now", "today", "yesterday",
"tomorrow", "noon", "teatime", "midnight", HH:MM[am|pm] prefixes,
MM/dd/YY[YY], YYYYMMdd, month-name dates, day-of-week names, and signed
offsets like ``-3h``, ``+2d``, ``now-10min``.

Pure driver-side function; feeds timestamp literals into DataFrame filters.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

_TIME_RE = re.compile(r"(\d{1,2}):(\d{2})([ap]m)?(.*)")
_OFFSET_RE = re.compile(r"(-?\d*)([a-z]*)")

_DOW = {"mon": 0, "tue": 1, "wed": 2, "thu": 3, "fri": 4, "sat": 5, "sun": 6}
_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def parse_datetime(s: str, now: datetime | None = None) -> datetime:
    """Parse a from/until string; `now` is injectable for tests
    (reference uses `new DateTime()`)."""
    if now is None:
        now = datetime.now()
    s = s.replace(" ", "").replace(",", "").replace("_", "").lower()

    if s.lstrip("-").isdigit() and not _is_likely_date(s):
        return datetime.fromtimestamp(int(s))

    m = re.fullmatch(r"(\d{1,2}):(\d{2})(\d{8})", s)
    if m:
        try:
            return datetime.strptime(s, "%H:%M%Y%m%d")
        except ValueError:
            pass

    date_part, offset = _split_offset(s)
    dt = _extract_time(date_part, now)
    dt = _extract_date(date_part, dt)
    if offset:
        dt = _apply_offset(dt, offset)
    return dt


def _is_likely_date(s: str) -> bool:
    return len(s) == 8 and int(s[:4]) > 1900 and int(s[4:6]) < 13 and int(s[6:]) < 32


def _split_offset(s: str) -> tuple[str, str]:
    if "+" in s:
        head, _, tail = s.partition("+")
        return head, tail
    if "-" in s:
        head, _, tail = s.partition("-")
        return head, "-" + tail
    return s, ""


def _apply_offset(dt: datetime, offset: str) -> datetime:
    m = _OFFSET_RE.fullmatch(offset)
    if not m or not m.group(1):
        return dt
    count = int(m.group(1))
    unit = m.group(2)
    if unit.startswith("s"):
        return dt + timedelta(seconds=count)
    if unit.startswith("min"):
        return dt + timedelta(minutes=count)
    if unit.startswith("h"):
        return dt + timedelta(hours=count)
    if unit.startswith("d"):
        return dt + timedelta(days=count)
    if unit.startswith("mon"):
        month0 = dt.month - 1 + count
        year, month = dt.year + month0 // 12, month0 % 12 + 1
        return dt.replace(year=year, month=month, day=_clamp_day(year, month, dt.day))
    if unit.startswith("y"):
        year = dt.year + count
        return dt.replace(year=year, day=_clamp_day(year, dt.month, dt.day))
    return dt


def _clamp_day(year: int, month: int, day: int) -> int:
    """Joda plusMonths/plusYears clamp: Jan 31 + 1mon → Feb 28/29, not a
    ValueError (reference DateTimeParser offset semantics)."""
    import calendar

    return min(day, calendar.monthrange(year, month)[1])


def _extract_time(date_part: str, now: datetime) -> datetime:
    dt = now.replace(second=0, microsecond=0)
    if date_part == "" or "now" in date_part:
        return dt
    hour, minute = 0, 0
    rest = date_part
    m = _TIME_RE.fullmatch(date_part)
    if m:
        hour, minute = int(m.group(1)), int(m.group(2))
        if m.group(3) == "pm":
            hour = (hour + 12) % 24
        rest = m.group(4)
    if "noon" in rest:
        hour = 12
    elif "teatime" in rest:
        hour = 16
    # "midnight" keeps hour 0
    return dt.replace(hour=hour, minute=minute)


def _extract_date(date_part: str, dt: datetime) -> datetime:
    s = date_part
    # strip any leading HH:MM[am/pm]
    m = _TIME_RE.fullmatch(s)
    if m:
        s = m.group(4)
    for word in ("noon", "teatime", "midnight"):
        s = s.replace(word, "")
    if "tomorrow" in s:
        dt = dt + timedelta(days=1)
        s = s.replace("tomorrow", "")
    elif "yesterday" in s:
        dt = dt - timedelta(days=1)
        s = s.replace("yesterday", "")
    elif "today" in s:
        s = s.replace("today", "")
    if not s or "now" in s:
        return dt

    for fmt in ("%m/%d/%y", "%m/%d/%Y", "%Y%m%d"):
        try:
            d = datetime.strptime(s, fmt)
            return dt.replace(year=d.year, month=d.month, day=d.day)
        except ValueError:
            pass
    # month-name date, e.g. "january10" / "january102024"
    m = re.fullmatch(r"([a-z]+?)(\d{1,2})(\d{4})?", s)
    if m and m.group(1)[:3] in _MONTHS:
        month = _MONTHS[m.group(1)[:3]]
        day = int(m.group(2))
        year = int(m.group(3)) if m.group(3) else dt.year
        return dt.replace(year=year, month=month, day=day)
    # day-of-week: walk back to the most recent such day
    if s[:3] in _DOW:
        target = _DOW[s[:3]]
        while dt.weekday() != target:
            dt = dt - timedelta(days=1)
    return dt
