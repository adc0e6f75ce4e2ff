"""Upstream XPathHelperTest.testAddNamespaceToXPath — harvested
MECHANICALLY: every assertEquals(expected,
XPathHelper.addXhtmlNsToXPath(input)) pair in the Java source runs
verbatim (17 vectors, including the masked-quote translate() cases).

The DOM-query tests (getElementById / namespace mappings /
getXhtmlNodes) exercise javax.xml.xpath itself, which this repo
substitutes with its own DOM + PageAnalyzer xpath helper family
(tests/test_pageanalyzer_reference.py) — out of scope here.
"""

import re

from kgp.html_text import add_xhtml_ns_to_xpath

JAVA = ("/root/reference/palladian-commons/src/test/java/ws/"
        "palladian/helper/html/XPathHelperTest.java")


def _harvest():
    src = open(JAVA).read()
    # match assertEquals("expected", XPathHelper.addXhtmlNsToXPath("input"))
    pat = re.compile(
        r'assertEquals\(\s*"((?:[^"\\]|\\.)*)",\s*'
        r'XPathHelper\.addXhtmlNsToXPath\("((?:[^"\\]|\\.)*)"\)\)',
        re.S)
    out = []
    for m in pat.finditer(src):
        expected = m.group(1).replace('\\"', '"')
        given = m.group(2).replace('\\"', '"')
        out.append((given, expected))
    return out


def test_harvest_found_vectors():
    assert len(_harvest()) >= 17


def test_add_namespace_to_xpath():
    failures = []
    for given, expected in _harvest():
        got = add_xhtml_ns_to_xpath(given)
        if got != expected:
            failures.append((given, got, expected))
    assert not failures, failures
