"""The reference's OWN WikipediaLocationImporterTest reproduced on
its own WikipediaPagesDump.xml fixture (assertions copied 1:1 —
the upstream-commented blocks for 564258/1227/the superseded Charles
River coordinate are excluded there too).

Source: WikipediaLocationImporterTest.java:21-106.
"""

import pytest

from kgp.wikidump import parse_dump_pages
from kgp.wikilocations import parse_location_page

FIXTURE = ("/root/reference/palladian-core/src/test/resources/"
           "apiResponse/WikipediaPagesDump.xml")


@pytest.fixture(scope="module")
def locations():
    xml = open(FIXTURE).read()
    rows = {}
    for p in parse_dump_pages(xml):
        r = parse_location_page(p.page_id, p.namespace_id, p.title,
                                p.text)
        if r:
            rows[r["location_id"]] = r
    return rows


def test_import(locations):
    loc = locations[27394805]
    assert loc["name"] == "Heir Island"
    assert abs(loc["lat"] - 51.5) < 0.0001
    assert abs(loc["lng"] - -9.433333) < 0.0001
    assert loc["type"] == "LANDMARK"
    assert "Hare Island" in loc["alt_names"]
    assert "Inishodriscol" in loc["alt_names"]

    loc = locations[146280]
    assert loc["name"] == "Charles River"
    assert abs(loc["lat"] - 42.192778) < 0.0001
    assert abs(loc["lng"] - -71.511944) < 0.0001
    assert loc["type"] == "LANDMARK"

    loc = locations[828347]
    assert loc["name"] == "Muskingum University"
    assert abs(loc["lat"] - 39.995278) < 0.0001
    assert abs(loc["lng"] - -81.734444) < 0.0001
    assert loc["type"] == "POI"

    loc = locations[112141]
    assert loc["name"] == "Whitestown"
    assert abs(loc["lat"] - 39.996111) < 0.0001
    assert abs(loc["lng"] - -86.344722) < 0.0001
    assert loc["type"] == "CITY"

    loc = locations[27198]
    assert loc["name"] == "Saint Kitts and Nevis"
    assert abs(loc["lat"] - 17.3) < 0.0001
    assert abs(loc["lng"] - -62.733333) < 0.0001
    assert loc["type"] == "COUNTRY"
    assert "Federation of Saint Christopher and Nevis" in \
        loc["alt_names"]
    assert "Federation of Saint Kitts and Nevis" in loc["alt_names"]

    loc = locations[827048]
    assert loc["name"] == "Dresden University of Technology"
    assert abs(loc["lat"] - 51.028056) < 0.0001
    assert abs(loc["lng"] - 13.726667) < 0.0001
    assert loc["type"] == "POI"
    assert sorted(loc["alt_names"]) == \
        ["TU Dresden", "TUD", "Technische Universität Dresden"]

    loc = locations[240912]
    assert loc["name"] == "Neuschwanstein Castle"
    assert abs(loc["lat"] - 47.5575) < 0.0001
    assert abs(loc["lng"] - 10.75) < 0.0001
    assert loc["type"] == "POI"
    assert loc["alt_names"] == ["Schloss Neuschwanstein"]
