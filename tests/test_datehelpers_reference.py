"""Upstream date-helper test vectors, transcribed mechanically.

Sources (assertions copied 1:1):
- DateComparatorTest.java:30-81, 175-181
- DateHelperTest.java:10-79
- DateNormalizerTest.java:9-55 (the un-commented assertions; the
  trailing block the reference itself marks FIXME/commented-out is
  excluded there too)
"""

import functools

from kgp.dateparse import (find_date, format_duration, get_datetime,
                           get_normalized_date_string, get_time_string,
                           month_name_to_number, parse_date,
                           parse_date_auto)
from kgp.datestack import compare_dates

ISO_YMD = "YYYY-MM-DD"
ISO_YM = "YYYY-MM"
ISO_YMD_T = "YYYY-MM-DDTHH:MM:SS+HH:MM"

# DateExactness values (DateExactness.java:21-33)
DAY, HOUR, SECOND = 3, 4, 6


def _dates():
    date1 = parse_date("2010-09-01", ISO_YMD)
    date2 = parse_date("2005-09-01", ISO_YMD)
    date3 = parse_date("2010-07-21", ISO_YMD)
    date4 = parse_date("2010-07", ISO_YM)
    date5 = parse_date("2010-09-01", ISO_YMD)
    date6 = parse_date("2010-09-03", ISO_YMD)
    date7 = parse_date("2010-09-01T20:14:00", ISO_YMD_T)
    date8 = parse_date("2010-09-01T19:12:00", ISO_YMD_T)
    date9 = parse_date("2010-09-01T20:12:00", ISO_YMD_T)
    return (date1, date2, date3, date4, date5, date6, date7, date8,
            date9)


def test_date_comparator1():
    (d1, d2, d3, d4, d5, d6, d7, d8, d9) = _dates()
    dates = [d1, d2, d8, d4, d5, d6, d7, d3, d9, d2]
    dates.sort(key=functools.cmp_to_key(
        lambda a, b: compare_dates(a, b, SECOND)))
    expected = [d6, d7, d9, d8, d1, d5, d3, d4, d2, d2]
    assert [d.date_string for d in dates] == \
        [d.date_string for d in expected]


def test_date_comparator2():
    (_, _, _, _, _, d6, d7, d8, d9) = _dates()
    assert compare_dates(d7, d8, DAY) == 0
    assert compare_dates(d6, d7, DAY) == -1
    assert compare_dates(d7, d9, HOUR) == 0
    assert compare_dates(d7, d8, HOUR) == -1


def test_compare_depth():
    # DateExactness.getCommonExactness = byValue(min) (:70-74)
    year, hour = 1, 4
    assert min(year, hour) == year


# --------------------------------------------------- DateHelperTest


def test_get_datetime():
    assert get_datetime("dd.MM.yyyy", 1274313600000) == "20.05.2010"


def test_get_time_string():
    assert get_time_string(0) == "0ms"
    assert get_time_string(273823872) == "3d:4h:3m:43s:872ms"
    assert get_time_string(60000) == "1m:0s:0ms"
    assert get_time_string(3600000) == "1h:0m:0s:0ms"


def test_format_duration_readable():
    # DateHelper.main's documented examples (:316-319), incl. the
    # readable post-pass: ", " separators, last one -> " and "
    assert format_duration(0, 10805000, False) == \
        "3 hours and 5 seconds"
    assert format_duration(0, 273823872, False) == \
        "3 days, 4 hours, 3 minutes, 43 seconds and 872 milliseconds"
    assert format_duration(0, 10800000, False) == "3 hours"


def test_month_name_to_number():
    german = ["Januar", "Februar", "März", "April", "Mai",
              "Juni", "Juli", "August", "September", "Oktober",
              "November", "Dezember"]
    english = ["January", "February", "March", "April", "May", "June",
               "July", "August", "September", "October", "November",
               "December"]
    german_short = ["Jan", "Feb", "Mär", "Apr", "Mai", "Jun",
                    "Jul", "Aug", "Sep", "Okt", "Nov", "Dez"]
    english_short = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                     "Aug", "Sep", "Oct", "Nov", "Dec"]
    for names in (german, english, german_short, english_short):
        for i, name in enumerate(names, start=1):
            assert month_name_to_number(name) == i, name


# ----------------------------------------------- DateNormalizerTest


def _norm(s):
    d = parse_date_auto(s)
    assert d is not None, s
    return get_normalized_date_string(d)


def test_normalize_date():
    for s in ["17.01.1956", "17.1.1956", "17.1.56", "17/1/56",
              "17/01/1956", "17-01-1956", "17 January, 1956",
              "17 January 1956", "17 Jan 1956", "17th January 1956",
              "17. January 1956", "17.Jan '56", "17 JAN 56",
              "January 17,1956", "January 17,'56",
              "January 17th, 1956", "Jan 17th, 1956", "1956-01-17"]:
        assert _norm(s) == "1956-01-17", s
    assert _norm("January 3, 1956") == "1956-01-03"
    assert _norm("Mon, 12 Mar 2007 23:13:05 GMT") == \
        "2007-03-12 23:13:05"
    assert _norm("Mon, 13 Oct 2008 01:28:26 GMT") == \
        "2008-10-13 01:28:26"
    assert _norm("10 Oct 2008 21:34:01 EST") == "2008-10-10 21:34:01"
    assert _norm("Tue, 16 May 2006 15:04:54 +0900") == \
        "2006-05-16 06:04:54"
    assert _norm("2009-02-12 00:00:00") == "2009-02-12 00:00:00"
    assert _norm("2009-02-12") == "2009-02-12"

    # the findDate tail the reference keeps active
    assert get_normalized_date_string(
        find_date("Thu Feb 12 01:56:22 CET 2009")) == \
        "2009-02-12 01:56:22"
    assert get_normalized_date_string(
        find_date("Sun, 23 Nov 2008")) == "2008-11-23"
    assert get_normalized_date_string(
        find_date("Mon, 27 Oct 2008 19:00 GMT")) == "2008-10-27 19:00"
