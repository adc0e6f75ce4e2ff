"""PII scrubbing (kgp.pii) — pattern goldens, ordering, plan shape."""

import pytest

from tests.conftest import spark  # noqa: F401


def test_pii_scrub_goldens(spark):
    from kgp.pii import pii_scrub
    rows = [
        (1, "mail me at john.doe+spam@sub.example.co.uk today"),
        (2, "server 192.168.10.42 and 10.0.0.1 are up"),
        (3, "call +1 (555) 123-4567 or 030-1234-567 now"),
        (4, "no pii here at all, just prose."),
        (5, "mixed: a@b.io on 8.8.8.8 tel +49 30 1234 5678"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].clean_text == "mail me at <EMAIL_ADDRESS> today"
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (1, 0, 0)
    assert got[2].clean_text == \
        "server <IP_ADDRESS> and <IP_ADDRESS> are up"
    assert got[2].n_ips == 2
    assert "<PHONE_NUMBER>" in got[3].clean_text
    assert got[3].n_phones == 2
    assert got[4].clean_text == rows[3][1]
    assert (got[4].n_emails, got[4].n_ips, got[4].n_phones) == (0, 0, 0)
    r5 = got[5]
    assert r5.n_emails == 1 and r5.n_ips == 1 and r5.n_phones == 1
    assert "<EMAIL_ADDRESS>" in r5.clean_text
    assert "<IP_ADDRESS>" in r5.clean_text
    assert "<PHONE_NUMBER>" in r5.clean_text


def test_pii_order_tokens_never_rematch(spark):
    from kgp.pii import pii_scrub
    # an email whose domain looks like an IP, and an IP directly
    # adjacent to digits: replacement tokens carry no digits/@ so the
    # later passes cannot match inside earlier replacements
    docs = spark.createDataFrame(
        [(1, "x 1.2.3.4@mail.com y"),
         (2, "ip:1.2.3.4,tel +1 212 555 0199")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].clean_text == "x <EMAIL_ADDRESS> y"
    # counts are per-class on the RAW text (telemetry semantics), so
    # the IP-shaped local part still counts even though the email pass
    # consumed it in clean_text
    assert got[1].n_ips == 1
    assert "<IP_ADDRESS>" not in got[1].clean_text
    assert got[2].n_ips == 1 and got[2].n_phones == 1
    assert got[2].clean_text == "ip:<IP_ADDRESS>,tel <PHONE_NUMBER>"


def test_pii_plan_no_python_no_shuffle(spark):
    from kgp.pii import pii_scrub
    docs = spark.createDataFrame([(1, "a@b.co")],
                                 "doc_id long, text string")
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
