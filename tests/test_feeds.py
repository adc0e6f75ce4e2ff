"""Feed family tests: RSS/Atom round-trip, FeedPostStatistics parity
with a straight Python port of the Java math, the FeedClassifier rule
cascade hitting every class, item hashing, and update strategies."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kgp import feeds
from tests.conftest import SF_TEST

UTC0 = dt.datetime(2024, 1, 1)


def _mk_feeds(spark, rows):
    """rows: (feed_url, fetched_ts, xml-bytes)."""
    return spark.createDataFrame(
        rows, "feed_url string, fetched_ts timestamp, xml binary")


def _mk_items(spark, feed_url, stamps, poll):
    """Item table + matching feed table straight from timestamps."""
    f = spark.createDataFrame([(feed_url, poll)],
                              "feed_url string, fetched_ts timestamp")
    it = spark.createDataFrame(
        [(feed_url, poll, f"g{i}", f"t{i}", None, ts)
         for i, ts in enumerate(stamps)],
        "feed_url string, fetched_ts timestamp, guid string, "
        "title string, link string, published_ts timestamp")
    return f, it


# ------------------------------------------------------- XML parsing
RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel><title>Feed</title>
<item><title>A</title><link>http://x/a</link><guid>g1</guid>
<pubDate>Mon, 01 Jan 2024 06:30:05 GMT</pubDate></item>
<item><title>B</title><link>http://x/b</link><guid>g2</guid>
<pubDate>Tue, 02 Jan 2024 07:00:00 GMT</pubDate></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>C</title><link href="http://y/c"/><id>i1</id>
<published>2024-01-03T08:15:00Z</published></entry>
</feed>"""


def test_parse_rss_and_atom(spark):
    src = _mk_feeds(spark, [
        ("http://x/rss.xml", UTC0, bytearray(RSS)),
        ("http://y/atom.xml", UTC0, bytearray(ATOM)),
        ("http://z/bad.xml", UTC0, bytearray(b"<not xml")),
        ("http://w/other.xml", UTC0, bytearray(b"<html></html>")),
    ])
    rows = sorted(feeds.parse_feed_stage(src).collect(),
                  key=lambda r: r["guid"])
    assert [r["guid"] for r in rows] == ["g1", "g2", "i1"]
    assert rows[0]["title"] == "A"
    assert rows[0]["published_ts"] == dt.datetime(2024, 1, 1, 6, 30, 5)
    assert rows[2]["link"] == "http://y/c"
    assert rows[2]["published_ts"] == dt.datetime(2024, 1, 3, 8, 15)


def test_parse_handles_missing_fields(spark):
    xml = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
           b"<item><title>only-title</title></item></channel></rss>")
    rows = feeds.parse_feed_stage(
        _mk_feeds(spark, [("u", UTC0, bytearray(xml))])).collect()
    assert len(rows) == 1
    assert rows[0]["title"] == "only-title"
    assert rows[0]["guid"] is None and rows[0]["published_ts"] is None


# ------------------------------------------------- statistics parity
def _java_stats(stamps_ms, poll_ms):
    """Straight port of FeedPostStatistics.calculateStatistics
    (FeedPostStatistics.java:75-165) + FatStats median/sample-stddev
    (FatStats.java:146-194, Welford, isSample=true)."""
    out = dict(median=-1, avg=-1.0, std=-1, longest=-1, per_day=0.0,
               delay=-1, valid=False)
    ts = sorted(stamps_ms)
    if not ts:
        return out
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    newest, oldest = ts[-1], ts[0]
    out["delay"] = poll_ms - newest
    if len(ts) > 1:
        sg = sorted(gaps)
        n = 0.5 * len(sg)
        if n == int(n):
            med = 0.5 * sg[int(n) - 1] + 0.5 * sg[int(n)]
        else:
            med = float(sg[math.ceil(n) - 1])
        out["median"] = int(med)
        out["avg"] = (newest - oldest) / (len(ts) - 1)
        m = s = 0.0
        for k, v in enumerate(gaps, start=1):
            tmp = m
            m += (v - tmp) / k
            s += (v - tmp) * (v - m)
        std = math.sqrt(s / (len(gaps) - 1)) if len(gaps) > 1 else \
            float("nan")
        out["std"] = 0 if math.isnan(std) else int(std)
        out["longest"] = sg[-1]
        out["valid"] = True
    out["per_day"] = len(ts) / max(1, (newest - oldest) // 86_400_000)
    return out


@pytest.mark.parametrize("stamps", [
    [0, 60_000, 180_000, 240_000, 600_000],          # odd gap count
    [0, 10_000, 30_000, 100_000],                    # even gap count
    [0, 5_000],                                      # single gap
    [0],                                             # single item
    [],                                              # empty feed
    [0, 0, 0, 86_400_000, 86_400_000],               # duplicate stamps
])
def test_stats_match_java_port(spark, stamps):
    poll = dt.datetime(2024, 1, 10)
    poll_ms = int(poll.timestamp() * 1000)
    f, it = _mk_items(
        spark, "u",
        [dt.datetime.fromtimestamp(s / 1000, dt.timezone.utc)
         .replace(tzinfo=None) for s in stamps], poll)
    got = feeds.feed_post_statistics(f, it).collect()[0]
    want = _java_stats(stamps, poll_ms)
    assert got["n_items"] == len(stamps)
    assert got["median_gap_ms"] == want["median"]
    assert got["avg_gap_ms"] == pytest.approx(want["avg"])
    assert got["gap_stddev_ms"] == want["std"]
    assert got["longest_gap_ms"] == want["longest"]
    assert got["items_per_day"] == pytest.approx(want["per_day"])
    assert (got["delay_ms"] == want["delay"]) or not stamps
    assert got["valid"] == want["valid"]


# ----------------------------------------------- classifier cascade
MIN, HOUR, DAY = 60_000, 3_600_000, 86_400_000


def _classify(spark, stamps_ms, poll_ms):
    base = dt.datetime(2024, 1, 1)
    f, it = _mk_items(
        spark, "u",
        [base + dt.timedelta(milliseconds=s) for s in stamps_ms],
        base + dt.timedelta(milliseconds=poll_ms))
    out = feeds.classify_feeds(feeds.feed_post_statistics(f, it))
    return out.collect()[0]["pattern"]


@pytest.mark.parametrize("stamps,poll,want", [
    ([], 0, "EMPTY"),
    ([0], HOUR, "SINGLE_ENTRY"),
    # median gap < 5 s, delay < 5 s -> on the fly
    ([0, 1000, 2000, 3000], 4000, "ON_THE_FLY"),
    # median gap < 5 s, stale poll -> chunked burst
    ([0, 1000, 2000, 3000], 10 * DAY, "CHUNKED"),
    # dead for > 8 weeks and >= 8x median -> zombie
    ([0, DAY, 2 * DAY, 3 * DAY], 3 * DAY + 60 * DAY, "ZOMBIE"),
    # median > 1 day with jittery gaps -> spontaneous
    ([0, DAY, 3 * DAY, 8 * DAY], 9 * DAY, "SPONTANEOUS"),
    # tight sub-2h gaps, >= 4/day, low spread -> constant
    ([i * 30 * MIN for i in range(49)], 48 * 30 * MIN + MIN,
     "CONSTANT"),
    # > 2 h longest gap, median < 1 day -> sliced
    ([0, 3 * HOUR, 6 * HOUR, 12 * HOUR], 13 * HOUR, "SLICED"),
])
def test_classifier_cascade(spark, stamps, poll, want):
    assert _classify(spark, stamps, poll) == want


# ----------------------------------------------------------- hashing
def test_item_hash_matches_reference_recipe(spark):
    df = spark.createDataFrame(
        [("T", "http://x/a;jsessionid=f00dbabe24681357acef9753?r=1",
          "id-1"),
         (None, None, "id-2"),
         (None, None, None)],
        "title string, link string, guid string")
    got = df.select(feeds.item_hash_col(
        "title", "link", "guid").alias("h")).collect()
    want0 = hashlib.sha1(b"Thttp://x/a?r=1id-1").hexdigest()
    want1 = hashlib.sha1(b"nullnullid-2").hexdigest()
    assert got[0]["h"] == want0
    assert got[1]["h"] == want1
    assert got[2]["h"] is None


# ------------------------------------------------- update strategies
def test_mav_and_fix_learned_golden(spark):
    # 5 items, gaps [10, 20, 30, 40] min; poll 25 min after newest.
    base = dt.datetime(2024, 1, 1)
    offs = [0, 10, 30, 60, 100]
    f, it = _mk_items(
        spark, "u", [base + dt.timedelta(minutes=o) for o in offs],
        base + dt.timedelta(minutes=125))
    stats = feeds.feed_post_statistics(f, it)
    mav = feeds.mav_update_interval(stats).collect()[0]
    # Java: avg = 100min/4 = 25 min; delay 25 min > 0:
    # adj = avg - first_gap//4 + delay//4 = 1500000 - 150000 + 375000
    assert mav["mav_min"] == (1_500_000 - 150_000 + 375_000) // 60_000
    assert mav["mav_max"] == 5 * (1_500_000 - 150_000 + 375_000) // 60_000
    fixw = feeds.fix_learned_interval(stats, mode=0).collect()[0]
    assert fixw["fix_learned"] == 100 // 4          # span/( (n-1)*1min )
    fixp = feeds.fix_learned_interval(stats, mode=1).collect()[0]
    assert fixp["fix_learned"] == 125 // 5          # poll-oldest / n
    clamped = feeds.mav_update_interval(
        stats, lowest=40, highest=42).collect()[0]
    assert clamped["mav_min"] == 40 and clamped["mav_max"] == 42


def test_mav_single_item_defaults(spark):
    f, it = _mk_items(spark, "u", [dt.datetime(2024, 1, 1)],
                      dt.datetime(2024, 1, 2))
    mav = feeds.mav_update_interval(
        feeds.feed_post_statistics(f, it)).collect()[0]
    assert mav["mav_min"] == 30 and mav["mav_max"] == 60


# --------------------------------------------------------- round trip
def test_synth_corpus_round_trip(spark):
    src = feeds.synth_feeds(spark, SF_TEST)
    assert src.count() == 42
    items = feeds.parse_feed_stage(src)
    pats = (feeds.classify_feeds(
        feeds.feed_post_statistics(src, items))
        .groupBy("pattern").count().collect())
    by = {r["pattern"]: r["count"] for r in pats}
    assert by.get("EMPTY") == 2
    assert by.get("SINGLE_ENTRY") == 10
    assert len(by) >= 4  # variety: zombies/chunked/on-the-fly/...
    # every parsed date round-tripped exactly (no timezone drift)
    n_bad = items.where(F.col("published_ts").isNull()).count()
    assert n_bad == 0


# ----------------------------------------------------- feed discovery
def _discover(html):
    from kgp.html_text import parse_html
    return feeds.discover_feeds(parse_html(html),
                                "https://ex.org/sub/page.html")


def test_discover_basic_and_case_insensitive():
    got = _discover(
        '<html><head>'
        '<link rel="alternate" type="application/rss+xml" href="/r.xml">'
        '<LINK REL="ALTERNATE" TYPE="APPLICATION/ATOM+XML" '
        'HREF="https://f.example/a.xml" TITLE="T">'
        '<link rel="stylesheet" type="text/css" href="/s.css">'
        '<link rel="alternate" type="text/html" href="/mobile">'
        '</head><body></body></html>')
    assert [(d["feed_type"], d["feed_url"], d["title"]) for d in got] == [
        ("RSS", "https://ex.org/r.xml", None),
        ("ATOM", "https://f.example/a.xml", "T")]


def test_discover_feed_scheme_and_base_href():
    got = _discover(
        '<html><head><base href="https://cdn.ex.org/x/">'
        '<link rel="alternate" type="application/rss+xml" '
        'href="feed://h.example/f.xml">'
        '<link rel="alternate" type="application/atom+xml" '
        'href="rel.xml"></head></html>')
    assert got[0]["feed_url"] == "http://h.example/f.xml"
    # relative href resolves against the <base href>
    assert got[1]["feed_url"] == "https://cdn.ex.org/x/rel.xml"


def test_discover_requires_href_and_exact_type():
    got = _discover(
        '<html><head>'
        '<link rel="alternate" type="application/rss+xml">'
        '<link rel="alternate" type="application/rss+xml" href="">'
        '<link rel="alternate" type="application/rss+xml2" href="/x">'
        '</head></html>')
    assert got == []


def test_discover_stage_roundtrip(spark):
    pages = feeds.synth_feed_pages(spark, SF_TEST)
    out = feeds.discover_feeds_stage(pages)
    by_type = {r["feed_type"]: r["count"]
               for r in out.groupBy("feed_type").count().collect()}
    assert set(by_type) == {"RSS", "ATOM"}
    # variant 4 pages yield nothing; variant 5 pages yield two rows
    n_docs = pages.count()
    assert out.count() < 2 * n_docs


# -------------------------------------------- PostRateUpdateStrategy
def test_post_rate_local_dense_feed():
    from kgp.feeds import (MONTH_MINUTES, MS_PER_MIN,
                           post_rate_intervals_local)
    # 5 posts in one hour, range exactly covers those minutes: the
    # estimated-posts walk crosses 1 quickly
    base = 1_700_000_040_000 - (1_700_000_040_000 % MS_PER_MIN)
    ts = [base + m * MS_PER_MIN for m in (0, 10, 20, 45, 59)]
    mn, mx = post_rate_intervals_local(ts, base)
    assert 0 <= mn <= mx
    assert mn < MONTH_MINUTES


def test_post_rate_local_never_crosses():
    from kgp.feeds import (MAX_WALK_MINUTES, MONTH_MINUTES,
                           MS_PER_MIN, post_rate_intervals_local)
    # one post over a 200-day range: chance per minute ~200, prob sums
    # to 1 only after ~all cycles; with a lookup far from the post the
    # walk may not cross 1 within the bound
    base = 1_700_000_000_000 - (1_700_000_000_000 % MS_PER_MIN)
    ts = [base, base + 200 * 1440 * MS_PER_MIN]
    mn, mx = post_rate_intervals_local(ts, base)
    # min is the found crossing (which may exceed the 31-day default)
    # or the default; max is bounded by the walk limit
    assert mx <= MAX_WALK_MINUTES
    assert mn <= mx or mn == MONTH_MINUTES


def test_post_rate_stage_matches_local(spark):
    """Distributed closed form == literal Java walk on whole-day
    ranges (binary-exact probabilities)."""
    import random

    from kgp.feeds import MS_PER_MIN, post_rate_intervals, \
        post_rate_intervals_local
    rng = random.Random(7)
    rows, expected = [], {}
    lookup = 1_700_000_000_000 - (1_700_000_000_000 % MS_PER_MIN) \
        + 30 * MS_PER_MIN
    for feed in range(12):
        n = rng.randint(2, 40)
        days = rng.choice([1, 2, 4, 8])
        base = 1_690_000_000_000
        base -= base % MS_PER_MIN
        base += rng.randint(0, 1439) * MS_PER_MIN
        span = days * 1440 - 1
        offs = {0, span}
        while len(offs) < min(n, span):
            offs.add(rng.randint(0, span))
        ts = [base + o * MS_PER_MIN for o in sorted(offs)]
        rows += [(feed, t) for t in ts]
        expected[feed] = post_rate_intervals_local(ts, lookup)
    df = spark.createDataFrame(rows, "feed_id long, published_ms long")
    out = {r.feed: (r.min_check, r.max_check) for r in
           post_rate_intervals(df, lookup_ts_ms=lookup).collect()}
    assert out == expected


def test_post_rate_stage_clamp(spark):
    from kgp.feeds import MS_PER_MIN, post_rate_intervals
    base = 1_700_000_000_000 - (1_700_000_000_000 % MS_PER_MIN)
    ts = [base + m * MS_PER_MIN for m in (0, 1, 2, 3, 1439)]
    df = spark.createDataFrame([(1, t) for t in ts],
                               "feed_id long, published_ms long")
    r = post_rate_intervals(df, lookup_ts_ms=base, lowest=5,
                            highest=10000).collect()[0]
    assert r.postrate_min >= 5 and r.postrate_max <= 10000


def test_adaptive_ttl_and_lru2(spark):
    from kgp.feeds import (DEFAULT_CHECK_TIME, MS_PER_MIN,
                           adaptive_ttl_interval, lru2_interval)
    base = 1_700_000_000_000 - (1_700_000_000_000 % MS_PER_MIN)
    rows = [
        # feed 1: newest at base+100min, poll at base+200min
        (1, base), (1, base + 100 * MS_PER_MIN),
        # feed 2: newest == poll -> gap 0 -> default
        (2, base + 200 * MS_PER_MIN),
        # feed 3: duplicate newest -> LRU2 default
        (3, base), (3, base + 50 * MS_PER_MIN),
        (3, base + 50 * MS_PER_MIN),
        # feed 4: single item -> LRU2 default
        (4, base),
    ]
    df = spark.createDataFrame(rows, "feed_id long, published_ms long")
    poll = base + 200 * MS_PER_MIN
    ttl = {r.feed: r.adaptive_ttl for r in adaptive_ttl_interval(
        df, poll_ts_ms=poll, weight_m=0.2).collect()}
    # (int)(0.2 * 100min) = 20 ; feed 3: 0.2*150 = 30 ; feed 4: 0.2*200
    assert ttl[1] == 20 and ttl[2] == DEFAULT_CHECK_TIME
    assert ttl[3] == 30 and ttl[4] == 40
    lru = {r.feed: r.lru2 for r in lru2_interval(df).collect()}
    assert lru[1] == 100                      # gap of two newest
    assert lru[2] == DEFAULT_CHECK_TIME       # single item
    assert lru[3] == DEFAULT_CHECK_TIME       # duplicate newest
    assert lru[4] == DEFAULT_CHECK_TIME       # single item


# ------------------------------------------------------- IndHist
def test_ind_hist_local_walk():
    from kgp.feeds import MS_PER_MIN, ind_hist_interval_local
    # one item per hour over exactly one day -> rate 1.0 every hour;
    # poll at :15 -> remaining 0.75 items >= theta 0.5 -> same-hour
    base = 1_700_000_000_000 - (1_700_000_000_000 % 3_600_000)
    ts = [base + h * 3_600_000 for h in range(24)]
    got = ind_hist_interval_local(ts, base + 15 * MS_PER_MIN, 0.5)
    assert got == int(60 * 0.5 / 1.0) == 30


def test_ind_hist_stage_matches_local(spark):
    import random

    from kgp.feeds import MS_PER_MIN, ind_hist_interval, \
        ind_hist_interval_local
    rng = random.Random(11)
    rows, expected = [], {}
    # poll at minute 15:00 (dyadic remaining fraction 0.75)
    poll = 1_700_000_000_000 - (1_700_000_000_000 % 3_600_000) \
        + 15 * MS_PER_MIN
    for feedid in range(10):
        days = rng.choice([1, 2, 4])
        base = 1_690_000_000_000
        base -= base % MS_PER_MIN
        span = days * 1440 - 1
        n = rng.randint(2, 30)
        offs = {0, span}
        while len(offs) < n:
            offs.add(rng.randint(0, span))
        ts = [base + o * MS_PER_MIN for o in sorted(offs)]
        rows += [(feedid, t) for t in ts]
        expected[feedid] = ind_hist_interval_local(ts, poll, 0.75)
    df = spark.createDataFrame(rows, "feed_id long, published_ms long")
    out = {r.feed: r.indhist for r in ind_hist_interval(
        df, poll_ts_ms=poll, theta=0.75).collect()}
    assert out == expected


def test_mav_sync(spark):
    from kgp.feeds import DEFAULT_CHECK_TIME, MS_PER_MIN, \
        mav_sync_interval
    base = 1_700_000_000_000 - (1_700_000_000_000 % MS_PER_MIN)
    rows = [
        # feed 1: window 0..100min over 5 items -> gap 25; sync poll
        # newest+25min; last poll newest+10min -> ci 15, in bounds
        (1, base, base + 100 * MS_PER_MIN, 5,
         base + 110 * MS_PER_MIN, None),
        # feed 2: last poll far past sync point -> negative ci ->
        # fallback (lastPoll - oldest) / n = 500/5 = 100
        (2, base, base + 100 * MS_PER_MIN, 5,
         base + 500 * MS_PER_MIN, None),
        # feed 3: single item -> window 0 -> sync = newest -> ci
        # negative vs poll -> fallback 200/1
        (3, base, base, 1, base + 200 * MS_PER_MIN, None),
        # feed 4: ttl present
        (4, base, base + 100 * MS_PER_MIN, 5,
         base + 110 * MS_PER_MIN, 90),
    ]
    df = spark.createDataFrame(
        rows, "feed long, oldest long, newest long, n_items long, "
              "last_poll_ms long, rss_ttl int")
    got = {r.feed: r.mav_sync for r in mav_sync_interval(
        df, lowest=5, highest=10080).collect()}
    assert got[1] == 15
    assert got[2] == 100
    assert got[3] == 200
    ttl1 = {r.feed: r.mav_sync for r in mav_sync_interval(
        df, rss_ttl_mode=1, lowest=5, highest=10080).collect()}
    assert ttl1[4] == 90          # ttl as lower bound (15 < 90)
    ttl2 = {r.feed: r.mav_sync for r in mav_sync_interval(
        df, rss_ttl_mode=2, lowest=5, highest=10080).collect()}
    assert ttl2[4] == 90 and ttl2[1] == 15
    import pytest as _pt
    with _pt.raises(ValueError):
        mav_sync_interval(df, rss_ttl_mode=3)


# ----------------------------------------------------------- LIHZ08
def _lihz_case(feed: int, n_events: int = 25):
    """Deterministic synth feed: 21 daily training polls at 09:00 UTC
    starting day 18001+(feed%7) (a Monday + offset), items strictly
    between polls."""
    first = (18001 + feed % 7) * feeds.MS_PER_DAY + 9 * 3_600_000
    items = []
    for k in range(n_events):
        if (k * 31 + feed) % 3 == 0:  # sparse-ish
            day = (k * 7919 + feed) % 21
            off = 60 + (k * 37 + feed * 11) % 1320
            items.append(first + day * feeds.MS_PER_DAY
                         + off * feeds.MS_PER_MIN)
    return first, items


def test_lihz_local_quirks():
    # empty feed -> DEFAULT_CHECK_TIME, has_new False
    first = 18001 * feeds.MS_PER_DAY + 9 * 3_600_000
    iv, hn = feeds.lihz_interval_local([], first, 21, 0.6)
    assert (iv, hn) == (60, False)
    # dense feed, prediction on Monday: every trained day found=3/3
    dense = [first + d * feeds.MS_PER_DAY + 600 * feeds.MS_PER_MIN
             for d in range(21)]
    iv, hn = feeds.lihz_interval_local(dense, first, 21, 0.6)
    # prob_1 ~ 0.9 + 0.1*... >= 0.6 -> one day
    assert iv == 1440 and hn is True
    # high theta: the walk crosses the untrained index 0 (the
    # Saturday-cell quirk) and NaN-exits -- never runs past 7 days
    iv, _ = feeds.lihz_interval_local(dense, first, 21, 1e9)
    assert iv <= 7 * 1440
    # sparse feed with no found-days still in-model via prediction
    # poll's own new item (day 20 item -> has_new at prediction)
    only_last = [first + 20 * feeds.MS_PER_DAY
                 + 600 * feeds.MS_PER_MIN]
    iv, hn = feeds.lihz_interval_local(only_last, first, 21, 0.6)
    assert hn is True and iv >= 1440
    # bounded walk: highest < 1440 forbids even one iteration
    iv, _ = feeds.lihz_interval_local(dense, first, 21, 0.6,
                                      highest=1000)
    assert iv == 0 or iv == 1000  # raw 0, then clamp keeps 0
    # clamp lowest
    iv, _ = feeds.lihz_interval_local([], first, 21, 0.6, lowest=90)
    assert iv == 90


def test_lihz_saturday_double_increment():
    # first poll on a Saturday: 18001+5 = 18006 -> dow 7
    first = 18006 * feeds.MS_PER_DAY + 9 * 3_600_000
    assert feeds._dow_utc(first) == 7
    dense = [first + d * feeds.MS_PER_DAY + 600 * feeds.MS_PER_MIN
             for d in range(21)]
    iv, hn = feeds.lihz_interval_local(dense, first, 21, 0.95)
    assert iv >= 1440  # just exercises the collision path


def test_lihz_stage_matches_local(spark):
    rows_f, rows_i = [], []
    cases = {}
    for f in range(24):
        first, items = _lihz_case(f)
        if f % 11 == 5:
            items = []  # empty feeds stay in the roster
        cases[f] = (first, items)
        rows_f.append((f, first))
        rows_i += [(f, ts) for ts in items]
    fdf = spark.createDataFrame(rows_f, "feed long, first_poll_ms long")
    idf = spark.createDataFrame(rows_i or [(0, 0)],
                                "feed long, published_ms long")
    if not rows_i:
        idf = idf.where(F.lit(False))
    for theta, lo, hi in [(0.6, 5, -1), (1.7, -1, -1), (0.9, 5, 4320)]:
        got = {r["feed"]: (r["lihz"], r["has_new"], r["n_items"])
               for r in feeds.lihz_interval(
                   fdf, idf, n_train_polls=21, theta=theta,
                   lowest=lo, highest=hi).collect()}
        for f, (first, items) in cases.items():
            iv, hn = feeds.lihz_interval_local(
                items, first, 21, theta, lowest=lo, highest=hi)
            assert got[f][0] == iv, (f, theta, lo, hi, got[f], iv)
            assert got[f][1] == hn
            assert got[f][2] == len(items)


# ------------------------------------------------------- IndHistTTL
def test_predicted_in_window_local():
    # flat 1-per-hour model, poll at minute 45 (currentMinutes=2700
    # "minutes" -- the seconds-as-minutes quirk), 48h window:
    # t0 = 1*2700/60 = 45, k_d = 0, two full hours, 60-min tail
    rates = [1.0] * 24
    poll = (40 * 1440 + 12 * 60 + 45) * feeds.MS_PER_MIN
    p = feeds.predicted_in_window_local(rates, poll, 48)
    assert p == 45.0 + 1.0 + 1.0 + 60 * (1.0 / 60)
    # negative-tail quirk: window shorter than the fake 2700 minutes
    p = feeds.predicted_in_window_local(rates, poll, 24)
    assert p == 45.0 + (24 * 60 - 2700) * (1.0 / 60)
    assert p < 45.0
    # zero model
    assert feeds.predicted_in_window_local([0.0] * 24, poll, 48) == 0.0


def test_ind_hist_ttl_stage(spark):
    base0 = 26_666_666 * feeds.MS_PER_MIN
    poll = base0 + (40 * 1440 + 19) * feeds.MS_PER_MIN
    model_rows, new_rows = [], []
    for f in range(10):
        span = (f % 3 + 1) * 1440 - 1
        base = base0 + f * 1440 * feeds.MS_PER_MIN
        if f != 9:  # feed 9: no trained model -> predicted == 0
            for k in range(40):
                model_rows.append(
                    (f, base + ((k * 197) % (span + 1))
                     * feeds.MS_PER_MIN))
            model_rows += [(f, base),
                           (f, base + span * feeds.MS_PER_MIN)]
        if f % 6 != 5:
            d = 600 if f % 4 == 0 else 3000
            for k in range(0, 40, 7):
                new_rows.append(
                    (f, poll - (1 + k * 13 % d) * feeds.MS_PER_MIN))
    model = spark.createDataFrame(model_rows,
                                  "feed_id long, published_ms long")
    new = spark.createDataFrame(new_rows,
                                "feed_id long, published_ms long")
    out = {r["feed"]: r for r in feeds.ind_hist_ttl_interval(
        model, new, poll_ts_ms=poll, theta=0.75, t_burst=2.0,
        window_hours=48, weight_m=0.2, lowest=5).collect()}
    assert len(out) == 10
    # verify predicted/burst per feed against the literal twin
    from collections import defaultdict
    per = defaultdict(list)
    for f, ts in model_rows:
        per[f].append(ts)
    for f in range(10):
        rates = feeds.ind_hist_model_local(per[f])
        if f == 9:
            rates = [0.0] * 24
        pred = feeds.predicted_in_window_local(rates, poll, 48)
        real = sum(1 for ff, ts in new_rows
                   if ff == f and ts >= poll - 48 * 3_600_000)
        burst = (real > 0 and pred == 0) or \
            (pred != 0 and real / pred > 2.0)
        assert out[f]["used_ttl"] == int(burst), (f, pred, real)
        assert out[f]["real_in_window"] == real
        if burst:
            newest = max([ts for ff, ts in model_rows + new_rows
                          if ff == f])
            gap = poll - newest
            exp = int(0.2 * gap / 60_000) if gap > 0 else 60
            assert out[f]["indhist_ttl"] == max(5, exp)
        else:
            iv = feeds.ind_hist_interval_local(per[f], poll, 0.75)
            assert out[f]["indhist_ttl"] == max(5, iv)
    # both branches must occur in the slice
    flags = {out[f]["used_ttl"] for f in range(10)}
    assert flags == {0, 1}, flags


def test_fix_interval(spark):
    df = spark.createDataFrame([(1,), (2,)], "feed long")
    out = {r["feed"]: r["fix"]
           for r in feeds.fix_interval(df, 60, lowest=90).collect()}
    assert out == {1: 90, 2: 90}
    out = {r["feed"]: r["fix"]
           for r in feeds.fix_interval(df, 500, highest=120).collect()}
    assert out == {1: 120, 2: 120}
    import pytest as _pt
    with _pt.raises(ValueError):
        feeds.fix_interval(df, 0)


# ------------------------------------------ MetaInformationExtractor
def test_feed_meta_cols(spark):
    cases = [
        # (xml, status, expected dict subset)
        ('<rss version="2.0"><channel><ttl>45</ttl>'
         '<item><guid>g</guid><pubDate>x</pubDate></item>'
         '</channel></rss>', 200,
         dict(accessible=True, feed_format="rss_2.0",
              has_item_ids=True, has_pub_date=True, has_cloud=False,
              ttl=45, has_updated=None)),
        ('<rss version="2.0"><channel><cloud domain="d"/>'
         '<skipDays><day>Sunday</day></skipDays>'
         '<item><guid></guid></item></channel></rss>', 200,
         dict(has_item_ids=False, has_pub_date=False, has_cloud=True,
              ttl=-1, has_skip_days=True, has_skip_hours=False)),
        ('<feed><entry><id>u</id><updated>t</updated></entry></feed>',
         200,
         dict(feed_format="atom_1.0", has_item_ids=True,
              has_updated=True, has_published=False,
              has_pub_date=None)),
        ('<feed><entry></entry></feed>', 200,
         dict(has_item_ids=False, has_updated=False)),
        ('<html>nope</html>', 200,
         dict(accessible=False, feed_format=None, has_item_ids=None)),
        ('<rss version="2.0"><channel><atom:link rel="hub" href="h"/>'
         '<item><guid>g</guid></item></channel></rss>', 404,
         dict(accessible=False, supports_pubsubhubbub=True)),
    ]
    df = spark.createDataFrame([(i, x, st) for i, (x, st, _)
                                in enumerate(cases)],
                               "i long, xml string, status int")
    rows = {r["i"]: r for r in df.select(
        "i", *feeds.feed_meta_cols(F.col("xml"),
                                   F.col("status"))).collect()}
    for i, (_, _, want) in enumerate(cases):
        for k, v in want.items():
            assert rows[i][k] == v, (i, k, rows[i][k], v)
