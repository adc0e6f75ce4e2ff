"""Upstream UnitNormalizerTest vectors, transcribed mechanically.

Sources (assertions copied 1:1):
- UnitNormalizerTest.java:16-77 (testDetectUnit + the
  UnitTranslator translation battery)
"""

from kgp.units import (detect_unit, get_normalized_number,
                       get_unit_type, translate_unit,
                       translate_units_of_input)


def test_detect_unit():
    assert detect_unit("10 t") == "t"
    assert get_unit_type("120 g/cm³") == "DENSITY"
    assert get_unit_type("120 gr.") == "WEIGHT"
    assert detect_unit("bis zu 230mb/s") == "MB/s"
    assert get_unit_type("230 MB/s") == "BANDWIDTH"
    assert get_unit_type("1 mAh") == "ELECTRIC_CHARGE"
    assert get_unit_type("1 A") == "CURRENT"
    assert get_unit_type("100 kN/m^2") == "PRESSURE"
    assert get_unit_type("100 kN/m²") == "PRESSURE"
    assert detect_unit("100kN/m²") == "kN/m²"
    assert detect_unit("230 Volt") == "Volt"
    assert detect_unit("39 hours") == "hours"
    assert detect_unit(
        "filter_groess # filter_groess # gross # 39") is None
    assert detect_unit("screen up to 350 inches.") == "inches"


def test_translation_normalized():
    assert get_normalized_number(
        5, translate_unit("cm", "de")) == 5.0
    assert get_normalized_number(
        5, translate_unit("Zoll", "de")) == 12.7
    assert get_normalized_number(
        1, translate_unit("kilowattstunde", "de")) == 3600000.0

    assert translate_units_of_input(
        "schleuderdrehzahl 7 U/min", "de") == \
        "schleuderdrehzahl 7 rpm"
    assert translate_units_of_input(
        "schleuderdrehzahl 7 u/minute", "de") == \
        "schleuderdrehzahl 7 rpm"
    assert translate_units_of_input(
        "description maximale schleuderdrehzahl: ca. 1.600 u/minute "
        "beim standardprogram baumwolle 60° c", "de") == \
        "description maximale schleuderdrehzahl: ca. 1.600 rpm " \
        "beim standardprogram baumwolle 60° c"
    assert translate_units_of_input(
        "nach einer Fahrzeit von 7 stunden", "de") == \
        "nach einer fahrzeit von 7 hours"
    assert translate_units_of_input(
        "Altersempfehlung ab 9 jahren", "de") == \
        "altersempfehlung ab 9 years"
    assert translate_units_of_input(
        "mit 12 kilokalorien sehr gesund", "de") == \
        "mit 12 kilocalories sehr gesund"
