"""The reference's OWN DateParserTest (palladian-commons
helper/date/DateParserTest.java) reproduced against kgp.dateparse.

testFindDate1/testFindDate2/testFindDates are harvested MECHANICALLY
from the Java source (uncommented assertEquals lines only), so every
upstream vector runs verbatim — no transcription drift.  The
scalar-twin methods (normalizeYear, removeNoDigits, get4DigitYear,
splitTimeZone, getSeparator, setTimeDiff, findRelativeDate) are
transcribed directly (they use the current-year context the harness
pins via CONTEXT_YEAR).
"""

from __future__ import annotations

import re

import pytest

from kgp import dateparse as dp
from kgp import dates as dts
from kgp.dateparse import (find_date, find_parsed_dates,
                           find_relative_date,
                           get_normalized_date_string)

_JAVA = ("/root/reference/palladian-commons/src/test/java/ws/"
         "palladian/helper/date/DateParserTest.java")

# RegExp.DATE_X -> the port's DateFormat objects
FORMATS = {
    "DATE_ANSI_C": dts.DATE_ANSI_C,
    "DATE_ANSI_C_TZ": dp.DATE_ANSI_C_TZ,
    "DATE_RFC_1036": dp.DATE_RFC_1036,
    "DATE_RFC_1036_UTC": dp.DATE_RFC_1036_UTC,
    "DATE_RFC_1123": dts.DATE_RFC_1123,
    "DATE_RFC_1123_UTC": dp.DATE_RFC_1123_UTC,
    "DATE_ISO8601_YMD_T": dp.DATE_ISO8601_YMD_T,
    "DATE_ISO8601_YMD_SEPARATOR_T": dp.DATE_ISO8601_YMD_SEPARATOR_T,
    "DATE_ISO8601_YMD": dp.DATE_ISO8601_YMD,
    "DATE_ISO8601_YMD_SEPARATOR": dp.DATE_ISO8601_YMD_SEPARATOR,
    "DATE_ISO8601_YMD_NO": dts.DATE_ISO8601_YMD_NO,
    "DATE_ISO8601_YWD": dp.DATE_ISO8601_YWD,
    "DATE_ISO8601_YWD_T": dp.DATE_ISO8601_YWD_T,
    "DATE_ISO8601_YWD_NO": dp.DATE_ISO8601_YWD_NO,
    "DATE_ISO8601_YW": dp.DATE_ISO8601_YW,
    "DATE_ISO8601_YW_NO": dp.DATE_ISO8601_YW_NO,
    "DATE_ISO8601_YD": dp.DATE_ISO8601_YD,
    "DATE_ISO8601_YD_T": dp.DATE_ISO8601_YD_T,
    "DATE_ISO8601_YD_NO": dp.DATE_ISO8601_YD_NO,
    "DATE_ISO8601_YM": dp.DATE_ISO8601_YM,
    "DATE_URL": dts.DATE_URL,
    "DATE_URL_D": dts.DATE_URL_D,
    "DATE_URL_MMMM_D": None,   # set below (lives in kgp.datestack)
    "DATE_EU_D_MM_Y": dts.THREE_PART_FORMATS[2],
    "DATE_EU_D_MM_Y_T": dts.TIME_FORMATS[2],
    "DATE_EU_D_MMMM_Y": dts.THREE_PART_FORMATS[5],
    "DATE_EU_D_MMMM_Y_T": dts.TIME_FORMATS[4],
    "DATE_EU_D_MM": dts.TWO_PART_FORMATS[5],
    "DATE_EU_D_MMMM": dts.TWO_PART_FORMATS[6],
    "DATE_EU_MM_Y": dp.DATE_EU_MM_Y,
    "DATE_EUSA_MMMM_Y": dts.TWO_PART_FORMATS[1],
    "DATE_USA_MM_D_Y": dts.THREE_PART_FORMATS[1],
    "DATE_USA_MM_D_Y_T": dts.TIME_FORMATS[1],
    "DATE_USA_MM_D_Y_T_SEPARATOR": dp.DATE_USA_MM_D_Y_T_SEPARATOR,
    "DATE_USA_MMMM_D_Y": dts.THREE_PART_FORMATS[3],
    "DATE_USA_MMMM_D_Y_T": dts.TIME_FORMATS[3],
    "DATE_USA_MM_D": dts.TWO_PART_FORMATS[2],
    "DATE_USA_MM_Y": dts.TWO_PART_FORMATS[3],
    "DATE_USA_MMMM_D": dts.TWO_PART_FORMATS[4],
    "DATE_CONTEXT_YYYY": dts.DATE_CONTEXT_YYYY,
}

from kgp import datestack as _ds  # noqa: E402
FORMATS["DATE_URL_MMMM_D"] = _ds.DATE_URL_MMMM_D


def _method_body(name: str, next_name: str) -> str:
    src = open(_JAVA, encoding="utf-8").read()
    return src.split(f"public void {name}()")[1] \
        .split(f"public void {next_name}()")[0]


def _norm(inp: str, formats=None) -> str | None:
    p = find_date(_unescape(inp), formats)
    return get_normalized_date_string(p) if p else None


def _unescape(s: str) -> str:
    return s.replace("\\\"", "\"").replace("\\\\", "\\")


def test_find_date1_all_vectors():
    body = _method_body("testFindDate1", "testFindDate2")
    pat = re.compile(
        r'^\s*assertEquals\("([^"]+)",\s*DateParser\.findDate\('
        r'"([^"]+)"\)\.getNormalizedDateString\(\)\);', re.M)
    pairs = pat.findall(body)
    assert len(pairs) >= 80   # the uncommented upstream vectors
    bad = [(i, e, _norm(i)) for e, i in pairs if _norm(i) != e]
    assert not bad, bad


def test_find_date2_explicit_formats():
    body = _method_body("testFindDate2", "testFindDates")
    # pairs of: date = DateParser.findDate("INPUT", RegExp.NAME);
    #           assertEquals(date.getDateString(), EXPECTED, ...);
    find_pat = re.compile(
        r'DateParser\.findDate\((?:"((?:[^"\\]|\\.)*)"|text),'
        r'\s*RegExp\.(\w+)\)')
    text_pat = re.compile(r'^\s*text = "((?:[^"\\]|\\.)*)";')
    # EXPECTED is either the literal/text in the 1st/2nd position of
    # assertEquals (both upstream layouts appear)
    assert_pat = re.compile(
        r'assertEquals\((?:date\.getDateString\(\),\s*)?'
        r'(?:"((?:[^"\\]|\\.)*)"|text),\s*'
        r'date\.getNormalizedDateString\(\)\);')
    lines = body.split("\n")
    text_var = None
    pending = None
    checked = 0
    bad = []
    for line in lines:
        if line.strip().startswith("//"):
            continue
        m = text_pat.search(line)
        if m:
            text_var = _unescape(m.group(1))
        m = find_pat.search(line)
        if m:
            inp = (_unescape(m.group(1)) if m.group(1) is not None
                   else text_var)
            pending = (inp, m.group(2))
        m = assert_pat.search(line)
        if m and pending is not None:
            inp, fname = pending
            pending = None
            expected = (_unescape(m.group(1))
                        if m.group(1) is not None else text_var)
            fmt = FORMATS.get(fname)
            if fmt is None:
                continue
            got = _norm(inp, [fmt])
            checked += 1
            if got != expected:
                bad.append((inp, fname, expected, got))
    # 83 findDate calls upstream; 81 sit on harvestable single lines
    assert checked >= 80, checked
    assert not bad, bad


def test_find_dates_all_vectors():
    body = _method_body("testFindDates", "testFindRelativeDate")
    pat = re.compile(
        r'assertEquals\("([^"]+)",\s*DateParser\.findDates\('
        r'"([^"]+)"\)\.get\(0\)\s*\.?\s*\.?getNormalizedDateString',
        re.S)
    pairs = pat.findall(body)
    # the simple one-liner vectors
    pat2 = re.compile(
        r'date = DateParser\.findDates\("([^"]+)"\)\.get\(0\)'
        r'\.getNormalizedDateString\(\);\s*\n\s*assertEquals\('
        r'"([^"]+)", date\);')
    pat2b = re.compile(
        r'date = DateParser\.findDates\("([^"]+)"\)\.get\(0\)\s*\n'
        r'\s*\.getNormalizedDateString\(\);\s*\n\s*assertEquals\('
        r'"([^"]+)", date\);')
    vectors = [(e, i) for e, i in pairs]
    vectors += [(e, i) for i, e in pat2.findall(body)]
    vectors += [(e, i) for i, e in pat2b.findall(body)]
    assert len(vectors) >= 30
    bad = []
    for exp, inp in vectors:
        dates = find_parsed_dates(_unescape(inp),
                                  dp.REF_ALL_DATE_FORMATS)
        got = get_normalized_date_string(dates[0]) if dates else None
        if got != exp:
            bad.append((inp, exp, got))
    assert not bad, bad
    # the multi-hit / count assertions, transcribed
    two = find_parsed_dates("2007-12-06T17:37:45Z 2008-12-06T17:37:45Z",
                            dp.REF_ALL_DATE_FORMATS)
    assert [get_normalized_date_string(d) for d in two] == [
        "2007-12-06 17:37:45", "2008-12-06 17:37:45"]
    one = find_parsed_dates("Saturday, September 20, 2008",
                            dp.REF_ALL_DATE_FORMATS)
    assert len(one) == 1
    assert get_normalized_date_string(one[0]) == "2008-09-20"
    one = find_parsed_dates("Mon, 18 Apr 2011 09:16:00 GMT-0700",
                            dp.REF_ALL_DATE_FORMATS)
    assert len(one) == 1
    assert get_normalized_date_string(one[0]) == "2011-04-18 16:16:00"
    one = find_parsed_dates("Dienstag, 03. Mai 2011 um 05:13",
                            dp.REF_ALL_DATE_FORMATS)
    assert len(one) == 1
    assert get_normalized_date_string(one[0]) == "2011-05-03"


def test_find_relative_date():
    # DateParserTest.testFindRelativeDate:422-440
    t = 1291201200000
    vec = [("5 days ago", "2010-11-26"), ("114 days ago", "2010-08-09"),
           ("4 month ago", "2010-08-03"), ("12 month ago", "2009-12-06"),
           ("1 year ago", "2009-12-01"), ("11 years ago", "1999-12-04"),
           ("1 minute ago", "2010-12-01")]
    for inp, exp in vec:
        d = find_relative_date(inp, t)
        assert get_normalized_date_string(d, time=False) == exp, inp


def test_normalize_year_remove_no_digits_4digit():
    # testNormalizeYear:442-463 (current-year cases pinned by
    # CONTEXT_YEAR = 2026), testRemoveNoDigits, testGet4DigitYear
    from kgp.dateparse import (CONTEXT_YEAR, get_4digit_year,
                               normalize_year, remove_no_digits)
    assert normalize_year("'99") == 1999
    assert normalize_year("'03") == 2003
    assert normalize_year("'10") == 2010
    assert normalize_year(str(CONTEXT_YEAR)) == CONTEXT_YEAR
    short = CONTEXT_YEAR % 100
    assert normalize_year(f"'{short}") == CONTEXT_YEAR
    assert normalize_year(str(short)) == CONTEXT_YEAR
    assert normalize_year(f"'{short + 1}") == CONTEXT_YEAR - 99
    assert normalize_year(str(short + 1)) == CONTEXT_YEAR - 99
    assert normalize_year("1915") == 1915
    assert normalize_year("2012\n1") == 2012
    assert remove_no_digits("23.") == "23"
    assert remove_no_digits("'23.") == "23"
    assert remove_no_digits("23,") == "23"
    assert remove_no_digits("21st") == "21"
    assert remove_no_digits("22nd") == "22"
    assert remove_no_digits("23rd") == "23"
    assert remove_no_digits("24th") == "24"
    assert get_4digit_year(20) == 2020
    assert get_4digit_year(7) == 2007
    assert get_4digit_year(10) == 2010
    assert get_4digit_year(99) == 1999


def test_split_time_zone_and_separator():
    # testSplitTimeZone:484-504, testGetSeparator:506-516
    from kgp.dateparse import _separator_regex, split_time_zone
    assert split_time_zone("22:10  UTC") == ("22:10 ", "UTC")
    assert split_time_zone("22:10 UTC") == ("22:10 ", "UTC")
    assert split_time_zone("22:10 GMT") == ("22:10 ", "GMT")
    assert split_time_zone("Wed, 02 Feb 2011 09:00:00 EST") == (
        "Wed, 02 Feb 2011 09:00:00 ", "EST")
    assert split_time_zone("22:10") is None
    assert _separator_regex("10.10.2010") == "\\."
    assert _separator_regex("10-10-2010") == "-"
    assert _separator_regex("10_10_2010") == "_"
    assert _separator_regex("10/10/2010") == "/"
    assert _separator_regex("2010-05-06") == "-"
    assert _separator_regex("2010_05_06") == "_"
    assert _separator_regex("2010.05.06") == "\\."
    assert _separator_regex("2010/05/06") == "/"


def test_set_time_diff():
    # testSetTimeDiff:518-530
    from kgp.dateparse import _Logic
    lg = _Logic()
    lg.year, lg.month, lg.day = 2010, 10, 10
    lg.hour, lg.minute = 12, 30
    lg.set_time_diff("06:30", "-")
    assert (lg.hour, lg.minute) == (19, 0)
