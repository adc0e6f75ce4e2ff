"""Upstream DateExtractionHelperTest vectors, transcribed
mechanically (DateExtractionHelperTest.java:47-173 — cluster,
countDates, filterExactest, isDateInRange; the filter-by-Java-class
test has no counterpart in the untyped ParsedDate model).
"""

from kgp import dateparse as dp
from kgp import dates as dts
from kgp.dateparse import parse_date
from kgp.datestack import (CURRENT_DATE, cluster_dates, count_dates,
                           filter_exactest, is_date_in_range)

YMD = dp.DATE_ISO8601_YMD.fmt
YMD_T = dp.DATE_ISO8601_YMD_T.fmt
YMD_SEP = dp.DATE_ISO8601_YMD_SEPARATOR.fmt
YM = dp.DATE_ISO8601_YM.fmt


def test_cluster():
    strs = ["2010-08-01", "2010-08-02", "2010-08-03", "2010-08-04",
            "2010-08-05", "2010-08-03", "2010-08-04", "2010-08-05",
            "2010-08-05", "2010-08-05", "2010-08-04", "2010-08-03",
            "2010-08-05", "2010-08-02", "2010-08-04"]
    dates = [parse_date(s, YMD) for s in strs]
    clusters = cluster_dates(dates, 3)          # DateExactness.DAY
    assert len(clusters) == 5
    assert [len(c) for c in clusters] == [1, 2, 3, 4, 5]
    assert clusters[0] == [dates[0]]
    assert clusters[1] == [dates[1], dates[13]]
    assert clusters[2] == [dates[2], dates[5], dates[11]]
    assert clusters[3] == [dates[3], dates[6], dates[10], dates[14]]
    assert clusters[4] == [dates[4], dates[7], dates[8], dates[9],
                           dates[12]]


def test_count_dates():
    strs = ["2010-08-01 12:00:00", "2010-08-01 12:00:30",
            "2010-08-01 12:30:30", "2010-08-01 13:00:00",
            "2010-08-02 12:00:00", "2010-09-01 12:00:00",
            "2011-09-01 12:00:00"]
    dates = [parse_date(s.replace(" ", "T"), YMD_T) for s in strs]
    d1 = dates[0]
    YEAR, MONTH, DAY, HOUR, MINUTE, SECOND = 1, 2, 3, 4, 5, 6
    assert count_dates(d1, dates, YEAR) == 5
    assert count_dates(d1, dates, MONTH) == 4
    assert count_dates(d1, dates, DAY) == 3
    assert count_dates(d1, dates, HOUR) == 2
    assert count_dates(d1, dates, MINUTE) == 1
    assert count_dates(d1, dates, SECOND) == 0


def test_get_exactest():
    dates = [parse_date("2012-08", YM),
             parse_date("2012-09", YM),
             parse_date("2012-08-28", YMD_SEP),
             parse_date("2012-08-29", YMD_SEP),
             parse_date("2012-08-30T12:05:30", YMD_T),
             parse_date("2012-08-30T12:05:31", YMD_T),
             parse_date("2012-08-30", YMD_SEP)]
    exactest = filter_exactest(dates)
    assert len(exactest) == 2
    assert exactest[0] == dates[4]
    assert exactest[1] == dates[5]


def test_is_date_in_range():
    assert is_date_in_range(parse_date("2010-01-01T12:30:30Z", YMD_T))
    assert is_date_in_range(parse_date("1990-11-13T00:00:00Z", YMD_T))
    assert is_date_in_range(CURRENT_DATE)
    assert not is_date_in_range(
        parse_date("1990-11-12T00:00:00Z", YMD_T))
    assert not is_date_in_range(
        parse_date("2090-11-12T00:00:00Z", YMD_T))
    assert is_date_in_range(
        parse_date("Nov 8, 2007", dts.THREE_PART_FORMATS[3].fmt))
    assert is_date_in_range(
        parse_date("3.9.2010", dts.THREE_PART_FORMATS[2].fmt))
    assert is_date_in_range(parse_date("2010-09", YM))
