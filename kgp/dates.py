"""Date detection — DateParser / DateAndTimeTagger port.

Format bank re-derived from the reference's RegExp date constants
(/root/reference/palladian-commons/src/main/java/ws/palladian/helper/constants/RegExp.java:21-69,
127-246) and the finder semantics of DateParser.findDates
(/root/reference/palladian-commons/src/main/java/ws/palladian/helper/date/DateParser.java:196-253):
formats are tried in declaration order, every found date string is
masked with 'x' before later (less specific) formats run, matches
directly neighboring digits or starting after a '.' are rejected.

The default bank holds the PROSE families — with-time variants (ISO
YMD+T, US/EU slash/dot dates with time, RegExp.java TIME_FORMATS),
three-part, two-part, compact ISO YYYYMMDD (ONE_PART_FORMATS), RFC
1123 / ANSI C and the in-context year — in the reference's
ALL_DATE_FORMATS family order (RFC > time > three-part > two-part >
one-part, RegExp.java:346-359), which is what makes the masking
semantics right: a dated timestamp masks before the bare date formats
run. The URL path formats live in URL_DATE_FORMATS (used by
kgp.pagedates, never by the NER add-back). Still deliberately out:
week/day-of-year ISO variants (YYYY-WW, YYYY-DDD and their compact/
time forms) — they collide with prose numbers far more than they
occur in it.

Pure Python (regex) — executed inside the mentions pandas UDF; no
Spark state.
"""

from __future__ import annotations

from typing import NamedTuple

import regex

# ---- component expressions (RegExp.java:21-69) -----------------------

LONG_YEAR = r"\d{4}"
SHORT_YEAR = r"\d{2}"
YEAR_SHORT_LONG = LONG_YEAR + r"|(?:'?" + SHORT_YEAR + ")"
MONTH_NUMBER_DOUBLE = r"0[1-9]|1[0-2]"
MONTH_NUMBER_NORMAL = r"1[0-2]|0?[1-9]"
DAY_OF_MONTH = r"0[1-9]|[12][0-9]|3[01]"
DAY_OF_MONTH_1 = r"[1-9]|[12][0-9]|3[01]"
DAY_OF_MONTH_1_2 = DAY_OF_MONTH + "|" + DAY_OF_MONTH_1
ST_ND_RD_TH_OPT = r"(?:st|nd|rd|th)?"
TIME_SEC = (r"(?:1[0-9]|2[0-4]|0[0-9]):(?:0[0-9]|[1-5][0-9])"
            r":(?:0[0-9]|[1-5][0-9])")
TIMEZONE = r"\s(?:UTC|MEZ|GMT|Z|AEST|BST|EST|CES?T)"

MONTH_NAME_SHORT_ENG = (
    "[Jj]an|[Ff]eb|[Mm]ar|[Aa]pr|[Mm]ay|[Jj]un|[Jj]ul|[Aa]ug|[Ss]ep"
    "|[Ss]ept|[Oo]ct|[Nn]ov|[Dd]ec"
    "|JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|SEPT|OCT|NOV|DEC")
# MONTH_NAME_LONG (RegExp.java:30-31): abbreviation-with-dot or full
MONTH_NAME_LONG = (
    r"[Aa]pr(?:\.|il)?|[Aa]ug(?:\.|ust)?|[Dd]e[cz](?:\.|ember)?"
    r"|[Ff]eb(?:\.|ruary?)?|[Jj]an(?:\.|uary?)?|[Jj]ul[.iy]?"
    r"|[Jj]un[.ei]?|[Mm]a(?:[iy]\.?)?|[Mm]är[.z]?|[Mm]ar(?:\.|ch)?"
    r"|[Nn]ov(?:\.|ember)?|[Oo][ck]t(?:\.|ober)?|[Ss]ep(?:\.|t(?:ember)?)?"
    r"|APR(?:\.|IL)?|AUG(?:\.|UST)?|DE[CZ](?:\.|EMBER)?|FEB(?:\.|RUARY?)?"
    r"|JAN(?:\.|UARY?)?|JUL[.IY]?|JUN[.EI]?|MA(?:[IY]\.?)?|MÄR[.Z]?"
    r"|MAR(?:\.|CH)?|NOV(?:\.|EMBER)?|O[CK]T(?:\.|OBER)?"
    r"|SEP(?:\.|T(?:EMBER)?)?")
# MONTH_NAME_LONG2 (RegExp.java:32-33): no-dot variant
MONTH_NAME_LONG2 = (
    r"[Aa]pr(?:il)?|[Aa]ug(?:ust)?|[Dd]e[cz](?:ember)?|[Ff]eb(?:ruary?)?"
    r"|[Jj]an(?:uary?)?|[Jj]ul[.iy]?|[Jj]un[.ei]?|[Mm]a[iy]?|[Mm]är[.z]?"
    r"|[Mm]ar(?:ch)?|[Nn]ov(?:ember)?|[Oo][ck]t(?:ober)?|[Ss]ep(?:t(?:ember)?)?"
    r"|APR(?:IL)?|AUG(?:UST)?|DE[CZ](?:EMBER)?|FEB(?:RUARY?)?|JAN(?:UARY?)?"
    r"|JUL[.IY]?|JUN[.EI]?|MA[IY]?|MÄR[.Z]?|MAR(?:CH)?|NOV(?:EMBER)?"
    r"|O[CK]T(?:OBER)?|SEP(?:T(?:EMBER)?)?")
WEEKDAY_NAME_SHORT = r"Mon|Tue|Wed|Thu|Fri|Sat|Sun"
WEEKDAY_NAME_LONG = r"(?:Mon|Tues|Wednes|Thurs|Fri|Satur|Sun)day"


class DateFormat(NamedTuple):
    pattern: "regex.Pattern"
    fmt: str


def _df(pat: str, fmt: str) -> DateFormat:
    return DateFormat(regex.compile(pat), fmt)


def _g(p: str) -> str:
    return "(?:" + p + ")"


# ---- time-of-day components (RegExp.java:43-65) ----------------------

HOUR = r"1[0-9]|2[0-4]|0[0-9]"
HOUR12 = r"1[0-2]|0[0-9]"
HOUR_1 = r"1[0-9]|2[0-4]|[0-9]"
HOUR12_1 = r"1[0-2]|[0-9]"
MIN = r"0[0-9]|[1-5][0-9]"
FLOAT_SEC_OPT = r"(?:\.\d*)?"
AM_PM = r"\s[AP]M"


def _time_of(hour: str, am_pm: bool = False) -> str:
    t = (_g(hour) + "(?::" + _g(MIN) + "(?::" + _g(MIN)
         + FLOAT_SEC_OPT + ")?)?")
    return t + (AM_PM + "?" if am_pm else "")


TIME24 = _time_of(HOUR)
TIME24_1 = _time_of(HOUR_1)
TIME12 = _time_of(HOUR12, am_pm=True)
TIME12_1 = _time_of(HOUR12_1, am_pm=True)
TIME = TIME12 + "|" + TIME24 + "|" + TIME12_1 + "|" + TIME24_1
TIME_SEPARATOR = r"\s(?:/\s)?"
GMT_OPT = r"\s?(?:GMT|UTC|Z)?"
DIFF_UTC = GMT_OPT + r"\s?[+-]" + _g(HOUR) + "(?::?" + _g(MIN) + ")?"
ISO_TIME = r"[T\s]" + TIME24 + "(?:" + DIFF_UTC + "|Z)?"
_TZ_OR_DIFF = "(?:" + DIFF_UTC + "|" + TIMEZONE + ")?"

# ---- format bank, reference declaration order (RegExp.java:295-320) --

DATE_RFC_1123 = _df(
    _g(WEEKDAY_NAME_SHORT) + ", " + _g(DAY_OF_MONTH) + " "
    + _g(MONTH_NAME_SHORT_ENG) + " " + LONG_YEAR + " " + TIME_SEC
    + TIMEZONE, "WD, DD MMM YYYY HH:MM:SS TZ")
DATE_ANSI_C = _df(
    _g(WEEKDAY_NAME_SHORT) + " " + _g(MONTH_NAME_SHORT_ENG) + " "
    + _g(DAY_OF_MONTH_1_2) + " " + TIME_SEC + " " + LONG_YEAR,
    "WD MMM DD_1 HH:MM:SS YYYY")

# raw pattern strings shared by the bare and with-time variants
_EU_D_MM_Y = "|".join(_g(DAY_OF_MONTH_1_2) + sep + _g(MONTH_NUMBER_NORMAL)
                      + sep + _g(YEAR_SHORT_LONG)
                      for sep in (r"\.", "/", "_", "-"))

# with-time variants (RegExp.java TIME_FORMATS subset, :300-303) — run
# BEFORE the bare three-part formats so a dated timestamp masks whole
TIME_FORMATS = [
    _df(_g(YEAR_SHORT_LONG) + "-" + _g(MONTH_NUMBER_DOUBLE) + "-"
        + _g(DAY_OF_MONTH) + ISO_TIME, "YYYY-MM-DDTHH:MM:SS+HH:MM"),
    _df(_g(MONTH_NUMBER_NORMAL) + "/" + _g(DAY_OF_MONTH_1_2) + "/"
        + _g(YEAR_SHORT_LONG) + TIME_SEPARATOR + _g(TIME) + _TZ_OR_DIFF,
        "MM/DD/YYYY HH:MM:SS +UTC"),
    _df(_g(_EU_D_MM_Y) + TIME_SEPARATOR + _g(TIME) + _TZ_OR_DIFF,
        "DD.MM.YYYY HH:MM:SS +UTC"),
    _df(_g(MONTH_NAME_LONG) + " " + _g(DAY_OF_MONTH_1_2)
        + ST_ND_RD_TH_OPT + ", " + _g(YEAR_SHORT_LONG) + ",?"
        + TIME_SEPARATOR + _g(TIME) + _TZ_OR_DIFF,
        "MMMM DD, YYYY HH:MM:SS +UTC"),
    _df(_g(DAY_OF_MONTH_1_2) + r"(?:\.?\s|-)" + _g(MONTH_NAME_LONG)
        + _g(r",?\s|-") + _g(YEAR_SHORT_LONG) + TIME_SEPARATOR
        + _g(TIME) + _TZ_OR_DIFF, "DD. MMMM YYYY HH:MM:SS +UTC"),
]

# compact ISO YYYYMMDD (ONE_PART_FORMATS, RegExp.java:124-125) — runs
# LAST; the digit-neighbor rule of findDates keeps it out of longer
# numbers
DATE_ISO8601_YMD_NO = _df(
    LONG_YEAR + _g(MONTH_NUMBER_DOUBLE) + _g(DAY_OF_MONTH), "YYYYMMDD")

THREE_PART_FORMATS = [
    _df(_g(YEAR_SHORT_LONG) + "-" + _g(MONTH_NUMBER_DOUBLE) + "-"
        + _g(DAY_OF_MONTH), "YYYY-MM-DD"),
    _df(_g(MONTH_NUMBER_NORMAL) + "/" + _g(DAY_OF_MONTH_1_2) + "/"
        + _g(YEAR_SHORT_LONG), "MM/DD/YYYY"),
    _df(_EU_D_MM_Y, "DD.MM.YYYY"),
    _df(_g(MONTH_NAME_LONG2) + r"(?:\s|\.|\.\s)" + _g(DAY_OF_MONTH_1_2)
        + _g(ST_ND_RD_TH_OPT + r",?\s|\,|\.\s?|\s")
        + _g(YEAR_SHORT_LONG), "MMMM DD, YYYY"),
    _df(_g(MONTH_NAME_LONG) + "-" + _g(DAY_OF_MONTH_1_2) + "-"
        + _g(YEAR_SHORT_LONG), "MMMM-DD-YYYY"),
    _df(_g(DAY_OF_MONTH_1_2) + _g(ST_ND_RD_TH_OPT + r"\s?|[.,]\s?|-")
        + _g(MONTH_NAME_LONG) + _g(r",?\s|-") + _g(YEAR_SHORT_LONG),
        "DD. MMMM YYYY"),
    _df(LONG_YEAR + "-" + _g(MONTH_NAME_LONG) + "-" + _g(DAY_OF_MONTH_1_2),
        "YYYY-MMM-D"),
]

TWO_PART_FORMATS = [
    _df(_g(YEAR_SHORT_LONG) + "-" + _g(MONTH_NUMBER_DOUBLE), "YYYY-MM"),
    _df(_g(MONTH_NAME_LONG) + " " + _g(YEAR_SHORT_LONG), "MMMM YYYY"),
    _df(_g(MONTH_NUMBER_NORMAL) + "/" + _g(DAY_OF_MONTH_1_2), "MM/DD"),
    _df(_g(MONTH_NUMBER_NORMAL) + "/" + _g(YEAR_SHORT_LONG), "MM/YYYY"),
    _df(_g(MONTH_NAME_LONG) + " " + _g(DAY_OF_MONTH_1_2) + ST_ND_RD_TH_OPT,
        "MMMM DD"),
    _df(_g(DAY_OF_MONTH_1_2) + r"\." + _g(MONTH_NUMBER_NORMAL) + r"\.",
        "DD.MM."),
    _df(_g(DAY_OF_MONTH_1_2) + r"\.? " + _g(MONTH_NAME_LONG), "DD.MMMM"),
]

# years after a introducing word ("in 1989") — DATE_CONTEXT_YYYY
# (RegExp.java:74-75)
DATE_CONTEXT_YYYY = _df(
    r"(?<=(in )|(of )|(from )|(year )|(until )|(through )|(during )|(^))"
    r"[0-9]{4}", "YYYY")

ALL_DATE_FORMATS: list[DateFormat] = (
    [DATE_ANSI_C, DATE_RFC_1123] + TIME_FORMATS + THREE_PART_FORMATS
    + TWO_PART_FORMATS + [DATE_ISO8601_YMD_NO]
)
DEFAULT_TAGGER_FORMATS: list[DateFormat] = (
    ALL_DATE_FORMATS + [DATE_CONTEXT_YYYY]
)


class FoundDate(NamedTuple):
    start: int
    value: str
    fmt: str


_HAS_DIGIT = regex.compile(r"\d")


def find_dates(text: str,
               formats: list[DateFormat] | None = None) -> list[FoundDate]:
    """DateParser.findDates port (DateParser.java:196-253): formats in
    order; each found date string masked with 'x' before later formats
    run; a match is skipped when the char before it is '.', or a
    direct neighbor is a digit.

    Fast path: every format in the bank requires at least one digit,
    so digit-free text (most prose sentences) skips the whole format
    sweep — this runs per sentence in the NER hot path."""
    if not _HAS_DIGIT.search(text):
        return []
    fmts = formats if formats is not None else ALL_DATE_FORMATS
    chars = list(text)
    out: list[FoundDate] = []
    for fmt in fmts:
        current = "".join(chars)
        for m in fmt.pattern.finditer(current):
            start, end = m.start(), m.end()
            if start > 0 and current[start - 1] == ".":
                continue
            digit_neighbor = start > 0 and current[start - 1].isdigit()
            if end < len(current) and current[end - 1] != "/":
                digit_neighbor = current[end].isdigit()
            if digit_neighbor:
                continue
            out.append(FoundDate(start, m.group(), fmt.fmt))
            for i in range(start, end):
                chars[i] = "x"
    return out


DATETIME_TAG_NAME = "DATETIME"  # DateAndTimeTagger.java:28


def tag_datetimes(text: str) -> list[FoundDate]:
    """DateAndTimeTagger.DEFAULT.getAnnotations port
    (DateAndTimeTagger.java:42-59): all default formats plus in-context
    years; one annotation per found date occurrence."""
    return find_dates(text, DEFAULT_TAGGER_FORMATS)


# ---- URL date formats (RegExp.java:96-113) --------------------------

DATE_URL_D = _df(
    "|".join(_g(YEAR_SHORT_LONG) + sep + _g(MONTH_NUMBER_DOUBLE)
             + sep + _g(DAY_OF_MONTH)
             for sep in ("/", "_", r"\.", "-")), "YYYY_MM_DD")
DATE_URL_SPLIT = _df(
    LONG_YEAR + "/.+/" + _g(MONTH_NUMBER_DOUBLE) + "[/._-]"
    + _g(DAY_OF_MONTH), "YYYY.x.MM.DD")
DATE_URL = _df(
    _g(YEAR_SHORT_LONG) + "[/._-]" + _g(MONTH_NUMBER_DOUBLE), "YYYY_MM")

URL_DATE_FORMATS: list[DateFormat] = [DATE_URL_D, DATE_URL_SPLIT,
                                      DATE_URL]
