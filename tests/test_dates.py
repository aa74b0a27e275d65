"""Date goldens ported from the reference's DateTest.java:21-35,64-71 and
UtilTest.java:12-20 tag-id goldens."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from solrutils_spark.functions.dates import (
    parse_date,
    parse_date_time,
    parse_time,
    to_solr_date,
    to_solr_date3,
)
from solrutils_spark.functions.text import create_valid_name, normalize, to_tag_id


def _fmt(dt: datetime) -> str:
    """SimpleDateFormat yyyy-MM-dd'T'HH:mm:ss.SSSXXX in the value's own zone."""
    base = dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{dt.microsecond // 1000:03d}"
    off = dt.utcoffset()
    if off == timezone.utc.utcoffset(None) or off.total_seconds() == 0:
        return base + "Z"
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return f"{base}{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"


# DateTest.dateTimeParse samples (src, expected-or-None-meaning-src)
DATETIME_SAMPLES = [
    ("2014-02-09T08:00:00.000-04:00", None),
    ("2016-12-30T23:59:59.999-05:00", None),
    ("2015-11-30T17:33:23.019 EST", "2015-11-30T17:33:23.019-05:00"),
    ("1968-06-11T09:33:25.717+03", "1968-06-11T09:33:25.717+03:00"),
    ("2011-11-07 19:53:58.717+0300", "2011-11-07T19:53:58.717+03:00"),
    ("2011-11-17 19:53:58.717 NotRecognized", "2011-11-17T19:53:58.717Z"),
    ("2011-06-07 19:53:58.717 America/New_York", "2011-06-07T19:53:58.717-04:00"),
    ("2011-01-07 19:53:58.717 America/New_York", "2011-01-07T19:53:58.717-05:00"),
    ("2012-10-27 22:00:01,17+0300", "2012-10-27T22:00:01.017+03:00"),
    ("2013-10-27 22:10:01 IST", "2013-10-27T22:10:01.000+05:30"),
    ("2014-10-27 22:10:59+05:30", "2014-10-27T22:10:59.000+05:30"),
    ("2016-12-31 23:59:59.999 Europe/Copenhagen ", "2016-12-31T23:59:59.999+01:00"),
    ("2017-10-28 22:10:01Z", "2017-10-28T22:10:01.000Z"),
]


@pytest.mark.parametrize("src,exp", DATETIME_SAMPLES)
def test_parse_date_time_goldens(src, exp):
    c = parse_date_time(src)
    assert c is not None, src
    assert _fmt(c) == (exp or src)


# DateTest.solrDate samples (date, time, tz, expected)
SOLRDATE_SAMPLES = [
    ("2014-02-09", "10:00:07", None, "2014-02-09T15:00:07Z"),  # America/New_York winter
    ("2014-02-09", "09:01:02", None, "2014-02-09T14:01:02Z"),
    ("2014-02-09", "10:00 PM", "GMT", "2014-02-09T22:00:00Z"),
    ("2014-02-09", "12:00:00 PM", "GMT+03:00", "2014-02-09T09:00:00Z"),
    ("2014-02-09", "12:00:00 AM", "GMT+03:00", "2014-02-08T21:00:00Z"),
    ("2014-02-09", "12:00 AM", "EST", "2014-02-09T05:00:00Z"),
]


@pytest.mark.parametrize("date,time,tz,exp", SOLRDATE_SAMPLES)
def test_to_solr_date3_goldens(date, time, tz, exp):
    assert to_solr_date3(date, time, tz) == exp


def test_to_solr_date_passthrough():
    assert to_solr_date("*") == "*"
    assert to_solr_date("NOW/DAY") == "NOW/DAY"
    assert to_solr_date("") == ""
    assert to_solr_date("2017-10-28T22:10:01Z") == "2017-10-28T22:10:01Z"
    assert to_solr_date("2017-10-28T22:10:01.000Z") == "2017-10-28T22:10:01.000Z"


def test_to_solr_date_parses():
    assert to_solr_date("2011-11-07 19:53:58.717+0300") == "2011-11-07T16:53:58.717Z"
    assert to_solr_date("not a date") is None


def test_parse_time():
    assert parse_time("10:30") == 10 * 3600000 + 30 * 60000
    assert parse_time("10:30:05") == 10 * 3600000 + 30 * 60000 + 5000
    assert parse_time("10:30:05.123") == 10 * 3600000 + 30 * 60000 + 5123
    assert parse_time("10:30:05,17") == 10 * 3600000 + 30 * 60000 + 5017
    assert parse_time("1030") == -1
    assert parse_time("ab:cd") == -1


def test_parse_date_leniency():
    assert parse_date("2014") == datetime(2014, 1, 1, tzinfo=timezone.utc)
    assert parse_date("2014-03") == datetime(2014, 3, 1, tzinfo=timezone.utc)
    assert parse_date("2014-03-09") == datetime(2014, 3, 9, tzinfo=timezone.utc)
    assert parse_date("2014-03-09garbage") == datetime(2014, 3, 9, tzinfo=timezone.utc)
    assert parse_date("14-03-09") is None


# UtilTest.testToTagId goldens
def test_to_tag_id():
    assert create_valid_name("John Dow") == "john-dow"
    assert to_tag_id("John Dow") == "john-dow"
    assert to_tag_id(" John  Dow ") == "-john--dow-"
    assert to_tag_id("Working with the CEO/Board/C-Suite") == "working-with-the-ceo-board-c-suite"
    assert to_tag_id("R&D Portfolio Management") == "r&d-portfolio-management"
    assert (
        to_tag_id("Research and Development: R&D Portfolio Management")
        == "research-and-development/r&d-portfolio-management"
    )
    assert (
        to_tag_id("Research and Development: R&D Portfolio Management", ": ", "/key-initiative/")
        == "research-and-development/key-initiative/r&d-portfolio-management"
    )


def test_normalize():
    assert normalize("a\r\nb\rc") == "a\nb\nc"
    assert normalize("  x  \n   y   ") == "x\ny"
    assert normalize("a \nb") == "a\nb"
