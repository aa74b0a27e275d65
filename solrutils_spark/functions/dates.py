"""C13/C18 — lenient datetime parsing + Solr canonical date strings.

Behavioral port of the reference's hand-rolled parsers (golden-tested by the
reference's own DateTest.java:21-35,64-71 matrix, reproduced in
tests/test_dates.py):

- :func:`parse_time`   — Util.java:45-96   ('HH:mm[:ss[.S[S[S]]]]', ','
  allowed as millis separator, 1-2 digit millis are literal milliseconds)
- :func:`parse_date`   — Util.java:107-151 ('yyyy[-MM[-dd]]', extra chars
  ignored, zero-filled, UTC)
- :func:`parse_date_time` — Util.java:161-239 (optional time, optional tz as
  ±H/±HH/±HHmm/±HH:mm or named; absent-tz-with-trailing-field → default
  America/New_York; unrecognized name → UTC)
- :func:`to_solr_date` — Util.java:301-316 (passthrough for ''/*/NOW/already
  canonical; else canonical instant)
- :func:`to_solr_date3` — Util.java:317-363 (date + separate time + tz)

The default timezone mirrors Util.java:30 (America/New_York). The data-side
equivalent is a ``to_timestamp`` cascade (:func:`solr_date_col`).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

UTC = timezone.utc
DEFAULT_TIMEZONE = "America/New_York"

# Java three-letter zone ids resolve through TimeZone.getTimeZone; the ones a
# query realistically sends, with Java's fixed/aliased meanings.
_NAMED_ZONES: dict[str, timezone | ZoneInfo] = {
    "EST": timezone(timedelta(hours=-5)),
    "HST": timezone(timedelta(hours=-10)),
    "MST": timezone(timedelta(hours=-7)),
    "IST": ZoneInfo("Asia/Kolkata"),
    "EAT": ZoneInfo("Africa/Nairobi"),
    "ECT": ZoneInfo("Europe/Paris"),
    "PST": ZoneInfo("America/Los_Angeles"),
    "CST": ZoneInfo("America/Chicago"),
    "MSK": ZoneInfo("Europe/Moscow"),
    "GMT": UTC,
    "UTC": UTC,
}


def get_zone(name: str):
    """TimeZone.getTimeZone semantics: named map → IANA → GMT±x → UTC fallback."""
    name = name.strip()
    if not name:
        return UTC
    if name in _NAMED_ZONES:
        return _NAMED_ZONES[name]
    if name.startswith("GMT") and len(name) > 3:
        off = _parse_offset(name[3:])
        return timezone(timedelta(milliseconds=off)) if off is not None else UTC
    if name.startswith(("+", "-")):
        off = _parse_offset(name)
        return timezone(timedelta(milliseconds=off)) if off is not None else UTC
    try:
        return ZoneInfo(name)
    except (KeyError, ValueError):
        return UTC


def _parse_offset(s: str) -> int | None:
    """±H[H[[:]mm]] → signed milliseconds (reference's char-level scan)."""
    if not s or s[0] not in "+-":
        return None
    sign = -1 if s[0] == "-" else 1
    ms = 0
    i = 1
    digits_hours = 0
    while i < len(s) and s[i].isdigit() and digits_hours < 2:
        ms = ms * 10 + int(s[i])
        digits_hours += 1
        i += 1
    ms *= 3_600_000
    if i < len(s) and s[i] == ":":
        i += 1
    mins = 0
    nd = 0
    while i < len(s) and s[i].isdigit() and nd < 2:
        mins = mins * 10 + int(s[i])
        nd += 1
        i += 1
    ms += mins * 60_000
    return sign * ms


def parse_time(tm: str) -> int:
    """'HH:mm[:ss[.SSS]]' → milliseconds since midnight, or -1."""
    n = len(tm)
    if n < 5 or tm[2] != ":":
        return -1
    try:
        val = int(tm[0]) * 36_000_000 + int(tm[1]) * 3_600_000
        val += int(tm[3]) * 600_000 + int(tm[4]) * 60_000
    except ValueError:
        return -1
    if n < 8 or tm[5] != ":":
        return val
    try:
        val += int(tm[6]) * 10_000 + int(tm[7]) * 1_000
    except ValueError:
        return -1
    ms = 0
    if n > 9 and tm[8] in ".,":
        for j in (9, 10, 11):
            if n > j and tm[j].isdigit():
                ms = ms * 10 + int(tm[j])
            else:
                break
    return val + ms


def parse_date(s: str) -> datetime | None:
    """'yyyy[-MM[-dd]]' (extra chars ignored) → UTC midnight datetime, or None."""
    n = len(s)
    if n < 10 or s[4] != "-" or s[7] != "-":
        if n == 4:
            s = s + "-01-01"
        elif n == 7 and s[4] == "-":
            s = s + "-01"
        else:
            return None
    try:
        yr, mm, dd = int(s[0:4]), int(s[5:7]), int(s[8:10])
        return datetime(yr, mm, dd, tzinfo=UTC)
    except ValueError:
        return None


def _zone_offset_ms(tz, instant_utc: datetime) -> int:
    off = instant_utc.astimezone(tz).utcoffset()
    return int(off.total_seconds() * 1000)


def parse_date_time(s: str) -> datetime | None:
    """Full lenient parse → timezone-aware datetime (reference Calendar twin)."""
    n = len(s)
    c = parse_date(s)
    if c is None:
        return None
    if n < 16 or s[10] not in " T":
        return c
    ms = parse_time(s[11:])
    if ms == -1:
        return c
    c = c + timedelta(milliseconds=ms)
    if n > 19:
        i = 19
        ch = ""
        while i < n:
            ch = s[i]
            if ch in "+-" or ch.isalpha():
                break
            i += 1
        if i < n:
            if ch in "+-":
                off = _parse_offset(s[i:])
                if off is None:
                    return c
                tz = timezone(timedelta(milliseconds=off))
                return (c - timedelta(milliseconds=off)).astimezone(tz)
            tz = get_zone(s[i:].strip())
            return (c - timedelta(milliseconds=_zone_offset_ms(tz, c))).astimezone(tz)
        tz = get_zone(DEFAULT_TIMEZONE)
        return (c - timedelta(milliseconds=_zone_offset_ms(tz, c))).astimezone(tz)
    return c


def iso_instant(dt: datetime) -> str:
    """DateTimeFormatter.ISO_INSTANT: millis printed only when nonzero."""
    u = dt.astimezone(UTC)
    base = u.strftime("%Y-%m-%dT%H:%M:%S")
    if u.microsecond:
        return f"{base}.{u.microsecond // 1000:03d}Z"
    return base + "Z"


def to_solr_date(date_string: str) -> str | None:
    s = date_string.strip()
    if not s or s == "*" or "NOW" in s:
        return s
    if s.endswith("Z") and len(s) in (20, 24):
        return s
    c = parse_date_time(s)
    return iso_instant(c) if c is not None else None


def to_solr_date3(
    date_string: str, time_string: str | None = None, tz_name: str | None = None
) -> str | None:
    c = parse_date(date_string)
    if c is None:
        return None
    if time_string and time_string.strip():
        t = time_string.strip()
        tod = None
        for fmt in ("%H:%M:%S", "%H:%M", "%H:%M:%S.%f", "%I:%M:%S %p", "%I:%M %p"):
            try:
                tod = datetime.strptime(t, fmt)
                break
            except ValueError:
                continue
        if tod is not None:
            c += timedelta(
                hours=tod.hour, minutes=tod.minute, seconds=tod.second,
                microseconds=tod.microsecond,
            )
    tz = get_zone(DEFAULT_TIMEZONE)
    if tz_name and tz_name.strip():
        t = tz_name.strip()
        if t.startswith(("+", "-")):
            t = "GMT" + t
        tz = get_zone(t)
    c = c - timedelta(milliseconds=_zone_offset_ms(tz, c))
    return iso_instant(c)


# ---- Column twin: canonical Solr date parse as a to_timestamp cascade ------

def solr_date_col(col: Column) -> Column:
    """Data-side lenient parse → timestamp (UTC session). Covers the common
    format matrix; exotic named-TZ strings are a query-compile concern."""
    return F.coalesce(
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ssXXX"),
        F.to_timestamp(col, "yyyy-MM-dd HH:mm:ss.SSSXXX"),
        F.to_timestamp(col, "yyyy-MM-dd HH:mm:ssXXX"),
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
        F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss"),
        F.to_timestamp(col, "yyyy-MM-dd HH:mm:ss"),
        F.to_timestamp(col, "yyyy-MM-dd"),
        F.to_timestamp(col, "yyyy-MM"),
        F.to_timestamp(col, "yyyy"),
    )
