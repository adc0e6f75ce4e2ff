"""Time-interval extraction (palladian-commons
helper/date/TimeIntervalParser.java:24-83).

"the movie lasted 2 hours and 5 minutes" -> 7500 seconds. Two passes,
exactly as the reference:

1. unit words — `[0-9]+(?=\\s?[dD]ays?)`, `hours?|hrs?`,
   `[mM]inutes?|[Mm]ins?`, `seconds?|secs?`; if ANY matched, return
   86400d + 3600h + 60m + s — INCLUDING 0 when the only match had
   value 0 (the reference returns the long, not null).
2. compact fallback — `\\d+(?=[hH])`, `\\d+(?=([mM])|( Mins|
   minutes))`, `\\d+(?=([sS])|( Seconds))`; returns null unless the
   total is > 0.

Input runs through a faithful-lite StringHelper.clean (control chars
removed, tags stripped, entities unescaped, NBSP -> space, double
spaces collapsed, trim-keep) — the full HtmlHelper.stripHtmlTags
script/comment handling is not replayed here (interval text is plain
prose; documented).

Spark shape: `time_interval_col` hands the IDENTICAL lookahead
patterns to the JVM regex engine (regexp_extract; pure columns, zero
Python). The DuckDB oracle derives expected seconds SYMBOLICALLY from
the closed-form synthesis — RE2 has no lookahead, so the oracle never
runs a regex at all.
"""

from __future__ import annotations

import html as _html
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from kgp.tokenize import _clean_trim

_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_TAGS = re.compile(r"<[^>]+>")

_DAYS = r"[0-9]+(?=\s?([dD]ays?))"
_HOURS = r"[0-9]+(?=\s?([hH]ours?|hrs?))"
_MINUTES = r"[0-9]+(?=\s?([mM]inutes?|[Mm]ins?))"
_SECONDS = r"[0-9]+(?=\s?([sS]econds?|secs?))"
_C_HOURS = r"\d+(?=[hH])"
_C_MINUTES = r"\d+(?=([mM])|( Mins| minutes))"
_C_SECONDS = r"\d+(?=([sS])|( Seconds))"


def _clean(text: str) -> str:
    """StringHelper.clean lite (StringHelper.java:1074-1101)."""
    text = _CONTROL.sub("", text or "")
    text = _TAGS.sub("", text)
    text = _html.unescape(text)
    text = text.replace(" ", " ")
    text = re.sub(r" {2,}", " ", text)
    text = _clean_trim(text, keep=".?!“”\"")
    text = text.replace("″", '"')
    if text.startswith(")"):
        text = text[1:]
    return text


def _first(pattern: str, s: str) -> str | None:
    m = re.search(pattern, s)
    return m.group(0) if m else None


def parse_time_interval(string: str | None) -> int | None:
    """TimeIntervalParser.parse (:24-83) -> seconds or None."""
    if string is None:
        return None
    s = _clean(string)
    days = hours = minutes = 0
    seconds = 0
    parsed = False
    m = _first(_DAYS, s)
    if m is not None:
        days = int(m)
        parsed = True
    m = _first(_HOURS, s)
    if m is not None:
        hours = int(m)
        parsed = True
    m = _first(_MINUTES, s)
    if m is not None:
        minutes = int(m)
        parsed = True
    m = _first(_SECONDS, s)
    if m is not None:
        seconds = int(m)
        parsed = True
    if parsed:
        return seconds + 86400 * days + 3600 * hours + 60 * minutes
    h = _first(_C_HOURS, s)
    mi = _first(_C_MINUTES, s)
    se = _first(_C_SECONDS, s)
    total = 0
    if h:
        total = 3600 * int(h)
    if mi:
        total += 60 * int(mi)
    if se:
        total += int(se)
    return total if total > 0 else None


def time_interval_col(text: Column) -> Column:
    """The parse as pure JVM columns: identical Java-regex lookahead
    patterns via regexp_extract (empty string == no match), the same
    two-pass precedence and the same zero/null semantics."""
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]",
                             ""),
            "<[^>]+>", ""),
        " {2,}", " ")

    def ext(pattern: str) -> Column:
        return F.regexp_extract(cleaned, pattern, 0)

    d, h = ext(_DAYS), ext(_HOURS)
    m, s = ext(_MINUTES), ext(_SECONDS)
    parsed = (d != "") | (h != "") | (m != "") | (s != "")
    primary = (F.coalesce(F.nullif(d, F.lit("")).cast("long"), F.lit(0))
               * 86400
               + F.coalesce(F.nullif(h, F.lit("")).cast("long"),
                            F.lit(0)) * 3600
               + F.coalesce(F.nullif(m, F.lit("")).cast("long"),
                            F.lit(0)) * 60
               + F.coalesce(F.nullif(s, F.lit("")).cast("long"),
                            F.lit(0)))
    ch, cm, cs = ext(_C_HOURS), ext(_C_MINUTES), ext(_C_SECONDS)
    compact = (F.coalesce(F.nullif(ch, F.lit("")).cast("long"),
                          F.lit(0)) * 3600
               + F.coalesce(F.nullif(cm, F.lit("")).cast("long"),
                            F.lit(0)) * 60
               + F.coalesce(F.nullif(cs, F.lit("")).cast("long"),
                            F.lit(0)))
    return F.when(parsed, primary) \
        .when(compact > 0, compact) \
        .otherwise(F.lit(None).cast("long"))


def on_schedule_col(ts: Column, *, day_of_year: int | None = None,
                    day_of_month: int | None = None,
                    day_of_week: int | None = None,
                    hour_of_day: int | None = None,
                    minute_of_hour: int | None = None) -> Column:
    """Schedule.onSchedule (palladian-commons helper/date/
    Schedule.java:12-50): a timestamp is on schedule when EVERY set
    field matches the calendar field of the instant -- day-of-week in
    Calendar convention (Sunday=1..Saturday=7), fixed-UTC like every
    calendar op in this repo. The reference's lastRun debounce is the
    scheduler polling loop's state, out of scope like the loop
    itself (Scheduler.java runs a thread timer). Pure JVM columns --
    at corpus scale this is a predicate, pushdown-friendly."""
    import pyspark.sql.functions as F
    cond = F.lit(True)
    if day_of_year is not None:
        cond = cond & (F.dayofyear(ts) == day_of_year)
    if day_of_month is not None:
        cond = cond & (F.dayofmonth(ts) == day_of_month)
    if day_of_week is not None:
        cond = cond & (F.dayofweek(ts) == day_of_week)
    if hour_of_day is not None:
        cond = cond & (F.hour(ts) == hour_of_day)
    if minute_of_hour is not None:
        cond = cond & (F.minute(ts) == minute_of_hour)
    return cond
