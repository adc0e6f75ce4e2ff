"""Page-type classification (kgp.pagetype)."""

from __future__ import annotations

from kgp.pagetype import (classify_content_type, consecutive_sentences,
                          content_type_stage, page_features)

SENTS = [("This is sentence number %s about the topic that keeps "
          "going for quite a while longer." % w)
         for w in ("one", "two", "three", "four", "five", "six")]
ARTICLE = ("<html><head><title>A long article</title></head><body>"
           "<article><p>" + " ".join(SENTS)
           + "</p></article></body></html>")


def test_consecutive_sentence_runs():
    text = "Alpha beta gamma. Delta epsilon zeta. UNRELATED GAP " \
           "Eta theta iota."
    sents = ["Alpha beta gamma.", "Delta epsilon zeta.",
             "Eta theta iota."]
    # first two are adjacent (+1 space), third breaks the run
    assert consecutive_sentences(sents, text) == 2
    # newlines between sentences become spaces and keep the run alive
    text2 = "Alpha beta gamma.\nDelta epsilon zeta."
    assert consecutive_sentences(sents[:2], text2) == 2


def test_search_results_rule():
    html = ("<html><head><title>Suche nach Katzen</title></head>"
            "<body><p>x</p></body></html>")
    assert classify_content_type(page_features(html)) == \
        "SEARCH_RESULTS"
    html = ("<html><head><title>ok</title></head><body>"
            "<h2>Search results for cats</h2></body></html>")
    assert classify_content_type(page_features(html)) == \
        "SEARCH_RESULTS"


def test_content_rule_consecutive_sentences():
    feat = page_features(ARTICLE)
    assert feat["consecutive"] >= 4
    assert classify_content_type(feat) == "CONTENT"


def test_overview_rules():
    # >= 7 read-more links
    links = "".join('<a href="/p%d">mehr &gt;&gt;</a>' % i
                    for i in range(8))
    html = f"<html><body>{links}</body></html>"
    assert classify_content_type(page_features(html)) == "OVERVIEW"
    # >= 10 big images
    imgs = "".join('<img src="/i%d.jpg" width="200" height="200">' % i
                   for i in range(10))
    html = f"<html><body>{imgs}</body></html>"
    assert classify_content_type(page_features(html)) == "OVERVIEW"
    # images without declared dimensions never trigger (size 1)
    imgs = "".join('<img src="/i%d.jpg">' % i for i in range(20))
    html = f"<html><body>{imgs}</body></html>"
    assert classify_content_type(page_features(html)) != "OVERVIEW"


def test_spam_rule_and_ingoing_split():
    html = "<html><body><p>Too short.</p></body></html>"
    assert classify_content_type(page_features(html)) == "SPAM"
    feat = page_features(
        '<html><body><a href="http://other.com/x">out</a>'
        '<a href="/rel">in</a>'
        '<a href="http://me.com/y">in2</a></body></html>',
        url="http://me.com/page")
    assert sorted(feat["ingoing"]) == ["in", "in2"]
    assert feat["outgoing"] == ["out"]


def test_content_type_stage_spark(spark):
    pages = spark.createDataFrame(
        [("http://a.com/1", ARTICLE.encode()),
         ("http://a.com/2", b"<html><body><p>Tiny.</p></body></html>"),
         ("http://a.com/3", b"")],
        "url string, html binary")
    got = {r.url: r.content_type
           for r in content_type_stage(pages).collect()}
    assert got["http://a.com/1"] == "CONTENT"
    assert got["http://a.com/2"] == "SPAM"
    assert got["http://a.com/3"] == "SPAM"
    plan = content_type_stage(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_page_type_rules():
    from kgp.pagetype import classify_page_type
    wp = '<html><head><meta name="Generator" content="WordPress 5.2">' \
         '</head><body></body></html>'
    assert classify_page_type(wp) == "BLOG"
    vb = '<html><head><meta name="generator" content="vBulletin 4">' \
         '</head></html>'
    assert classify_page_type(vb) == "FORUM"
    cp = '<html><head><meta name="copyright" content="Powered by ' \
         'phpBB"></head></html>'
    assert classify_page_type(cp) == "FORUM"
    ln = '<html><head><link rel="stylesheet" title="phpBB theme">' \
         '</head></html>'
    assert classify_page_type(ln) == "FORUM"
    gg = "<html><head><title>My Google Groups thread</title></head>" \
         "</html>"
    assert classify_page_type(gg) == "FORUM"
    assert classify_page_type("<html><body>hi</body></html>") == \
        "GENERIC"
    assert classify_page_type(b"") == "GENERIC"


def test_page_type_stage_spark(spark):
    from kgp.pagetype import page_type_stage
    pages = spark.createDataFrame(
        [("u1", b'<html><head><meta name="generator" '
                b'content="blogger"></head></html>'),
         ("u2", b"<html></html>")],
        "url string, html binary")
    got = {r.url: r.page_type for r in page_type_stage(pages).collect()}
    assert got == {"u1": "BLOG", "u2": "GENERIC"}
