"""MediaWikiUtilTest goldens (MediaWikiUtilTest.java) against
kgp.wiki — the strip-markup byte/hash pins over the reference's REAL
Wikipedia fixture pages, the full {{decdeg}} battery, and
removeBetween."""

from __future__ import annotations

import pytest

from kgp.tudloc import java_string_hash
from kgp.wiki import _remove_between, parse_dec_deg, strip_markup

_RES = ("/root/reference/palladian-core/src/test/resources/"
        "wikipedia/")


@pytest.mark.parametrize("page,elen,ehash", [
    ("Dresden.wikipedia", 44999, 82215810),
    ("LutonAirportParkwayRailwayStation.wikipedia", 2743,
     -1897009842),
    ("MiddlesbroughTransporterBridge.wikipedia", 6376, -2062978054),
])
def test_strip_markup_byte_and_hash_exact(page, elen, ehash):
    """testStripMarkup (:254-272): length AND Java String.hashCode of
    the stripped text — byte-identity on real Wikipedia markup."""
    raw = open(_RES + page, encoding="utf-8", errors="replace").read()
    content = "".join(l + "\n" for l in raw.splitlines())
    clean = strip_markup(content)
    assert len(clean) == elen
    assert java_string_hash(clean) == ehash


@pytest.mark.parametrize("markup,expected", [
    ("{{decdeg|deg=37|min=51|sec=00|hem=N}}", 37.85),
    ("{{decdeg|deg=119|min=34|sec=04|hem=W}}", -119.5677778),
    ("{{decdeg|37|51||N}}", 37.85),
    ("{{decdeg|119|34||W}}", -119.5666667),
    ("{{decdeg|37.85|||N}}", 37.85),
    ("{{decdeg|119.5666667|||W}}", -119.5666667),
    ("{{decdeg|37.85}}", 37.85),
    ("{{decdeg|-119.5666667}}", -119.5666667),
    ("{{decdeg|37.85||||1}}", 37.9),
    ("{{decdeg|-119.5666667||||1}}", -119.6),
    ("{{decdeg||51||N}}", 0.85),
    ("{{decdeg||34||W}}", -0.5666667),
    ("{{decdeg|0|51}}", 0.85),
    ("{{decdeg|-0|34}}", -0.5666667),   # sign taken from "-0"
])
def test_parse_dec_deg(markup, expected):
    """testExtractDecDeg (:274-291), the Template:Decdeg sandbox
    battery."""
    assert parse_dec_deg(markup) == pytest.approx(expected, abs=0.05)


def test_remove_between():
    """testRemoveBetween (:293-300)."""
    assert _remove_between("{{{{a}}b}}c{{d{{e}}}}f",
                           "{", "{", "}", "}") == " c f"
    assert _remove_between("{{{{a}}b}}c", "{", "{", "}", "}") == " c"
    assert _remove_between("a{{c}}\n\nb", "{", "{", "}", "}") == \
        "a \n\nb"
    assert _remove_between("abc {{d:{{e{{f}}}}}} gh {{ijk}} l",
                           "{", "{", "}", "}") == "abc   gh   l"


def _load(page: str) -> str:
    raw = open(_RES + page, encoding="utf-8", errors="replace").read()
    return "".join(l + "\n" for l in raw.splitlines())


@pytest.mark.parametrize("page,lat,lng", [
    ("San_Francisco_Bay_Area.wikipedia", 37.75, -122.283333),
    ("University_of_Pennsylvania.wikipedia", 39.953885, -75.193048),
])
def test_extract_coordinate_tag_real_pages(page, lat, lng):
    """testExtractCoordinateMarkupFromPages (:155-180)."""
    from kgp.wiki import extract_coordinate_tags
    tags = extract_coordinate_tags(_load(page))
    assert len(tags) == 1
    assert tags[0]["lat"] == pytest.approx(lat, abs=1e-6)
    assert tags[0]["lng"] == pytest.approx(lng, abs=1e-6)


@pytest.mark.parametrize("page,lat,lng", [
    ("Dresden.wikipedia", 51.033333, 13.733333),
    ("Metro_Vancouver.wikipedia", 49.249444, -122.979722),
    ("Lancaster_Girls'_Grammar_School.wikipedia", 54.04573, -2.80332),
    ("Saint_Kitts_and_Nevis.wikipedia", 17.3, -62.733333),
    ("Wild_Dunes.wikipedia", 32.796389, -79.765),
    ("Dry_Fork_(Cheat_River).wikipedia", 38.733611, -79.647778),
    ("Spice_Run_Wilderness.wikipedia", 38.043056, -80.233056),
    ("CraigsvilleWestVirginia.wikipedia", 38.333333, -80.642778),
])
def test_infobox_coordinates_real_pages(page, lat, lng):
    """testExtractCoordinatesFromInfobox (:181-253) over the real
    fixture pages."""
    from kgp.wiki import get_infoboxes, template_coordinates
    boxes = get_infoboxes(_load(page))
    cs = template_coordinates(boxes[0])
    assert len(cs) == 1
    assert cs[0]["lat"] == pytest.approx(lat, abs=1e-6)
    assert cs[0]["lng"] == pytest.approx(lng, abs=1e-6)


def test_infobox_coordinate_display_and_type():
    from kgp.wiki import get_infoboxes, template_coordinates
    cs = template_coordinates(get_infoboxes(
        _load("CraigsvilleWestVirginia.wikipedia"))[0])
    assert cs[0]["display"] == "inline,title"
    assert cs[0]["type"] == "region:US_type:city"
