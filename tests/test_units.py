"""Unit normalization goldens — ported from the reference's own
NormalizationTest.java (palladian-commons/src/test/java/ws/palladian/
helper/normalization/NormalizationTest.java), plus column-twin parity
checks."""

from __future__ import annotations

import pytest

from kgp import units as U


# ------------------------------------------------ normalizeNumber
@pytest.mark.parametrize("raw,want", [
    ("30,000,000.00", "30000000"),
    ("30,000,000.10", "30000000.1"),
    ("30,000,000?", "30000000?"),
    ("30,000,000!", "30000000!"),
    ("30,000,000.004500", "30000000.0045"),
    ("30,234523000", "30.234523"),
    ("4,07000", "4.07"),
    ("4.4560000", "4.456"),
    ("7,500,000", "7500000"),
    ("7,500,400", "7500400"),
    ("1990", "1990"),
])
def test_normalize_number(raw, want):
    assert U.normalize_number(raw) == want


# ----------------------------------------------------- detectUnit
@pytest.mark.parametrize("text,want", [
    ("8 t", "t"),
    ("8 kg/m³", "kg/m³"),
    ("8 in ghz", "ghz"),
    ("8 hz", "hz"),
    ("mhz", "mhz"),
    ("2cm- up to 8", "cm"),
    ("how much are 100 kilobytes", "kilobytes"),
    ("kilometers", "kilometers"),
    ("1.5miles", "miles"),
    ("2 liters of milk", "liters"),
    ("2g", "g"),
    ("100 hz", "hz"),
])
def test_detect_unit(text, want):
    assert U.detect_unit(text) == want


def test_detect_unit_typed():
    assert U.detect_unit("100 hz", "FREQUENCY") == "hz"


def test_get_unit_type():
    assert U.get_unit_type("g") == "WEIGHT"
    assert U.get_unit_type("tablespoon") == "VOLUME"


# --------------------------------------------- getNormalizedNumber
@pytest.mark.parametrize("text,want,places", [
    ("8766 cgs", 8766000, 1),
    ("2500mAh", 2.5, 1),
    ("25kbps", 25000, 1),
    ("3mBit/s", 3000000, 1),
    ('3.5"', 8.89, 1),
    ("2cl", 20.0, 2),
])
def test_normalized_number_str(text, want, places):
    assert U.normalized_number_str(text) == pytest.approx(
        want, abs=10 ** -places)


@pytest.mark.parametrize("number,text,want", [
    (1.6, " GHz, 1024MB RAM", 1600000000.0),
    (0.5, "fluid ounce", 14.785),
    (1, "measure", 44.3603),
    (2.5, "shots", 110.9),
    (21.4, " million. [1]", 21400000.0),
    (13, " per thousand asdf asdfisdf ", 1.3),
    (13, " per thousand. asdf asdfisdf ", 1.3),
    (13, " per 1000 asdf asdfisdf ", 1.3),
    (2, " hr. 32 min.", 9120.0),
    (6, "' 2''", 187.96),
    (6, "'2\"", 187.96),
    # reference golden says 18.75 with delta=2; the exact outcome of
    # the ported semantics is 7.5 * 2.54 = 19.05 (within that delta)
    (7.5, '"', 19.05),
    (5, "hours 4 minutes 6seconds", 18246.0),
    (6, " h 30 min", 23400.0),
    (5, "ft 9 inches", 175.26),
    (5, '"', 12.7),
    (2, "mb 4 GB", 2097152.0),
    (2, "mb 2mb", 2097152.0),
    (2, "mb 100kb", 2199552.0),
    (5, "mpixel", 5000000.0),
    (30, "miles per hour is really fast", 48.28),
    (20, "m kilometers", 2000.0),
    (53.4, "million, compared to", 53400000.0),
    (125, "ft-lbs torque!!!", 169.477),
    (125, "lb-ft torque, and power speed", 169.477),
    (125, "", 125.0),
    (1, "min 20s 23sdf sdf a__:", 80.0),
    (1, "hour 30 minutes 20sdf", 5400.0),
    (5, "ft 9 in 20sdf", 175.26),
    (1, "m20s 23sdf sdf a__:", 80.0),
    (1, ":20 23sdf sdf a__:", 80.0),
    (46, "% (2008)", 46.0),
])
def test_get_normalized_number(number, text, want):
    assert U.get_normalized_number(number, text) == pytest.approx(
        want, abs=0.01)


def test_normalized_number_pixel():
    assert U.get_normalized_number(214, " pixel [1]") == 214


# ------------------------------------------------ special formats
@pytest.mark.parametrize("number,text,want", [
    (6.0, "' 2'',", 187.96),
    (5, "' 9''", 175.26),
    (5, "'9''", 175.26),
    (5, "' 9\"", 175.26),
    (5, "'9\"", 175.26),
    (0, ":59", 59.0),
    (2, ":44", 164.0),
    (4, ":2:40", 14560.0),
    (4, ":02:40", 14560.0),
    (4, ":20:40", 15640.0),
    (1, "h 20m 40s", 4840.0),
    (2, "m 40s", 160.0),
    (1, "h20m40s", 4840.0),
    (1, "h20m", 4800.0),
    (2, "m40s", 160.0),
])
def test_handle_special_format(number, text, want):
    assert U.handle_special_format(number, text, 3) == pytest.approx(
        want, abs=0.01)


def test_same_type_and_bigger():
    assert U.units_same_type("gb", "mb") is True
    assert U.units_same_type("minute", "mb") is False
    assert U.is_bigger("minute", "second") is True


def test_unit_lookup_edges():
    assert U.unit_lookup("kg") == 1000.0
    assert U.unit_lookup("kg.") == 1000.0    # trailing dot stripped
    assert U.unit_lookup("nosuchunit") == -1.0
    assert U.transform("kg", 2500.0) == 2.5


# ------------------------------------------------- column twins
def test_column_twins_match_python(spark):
    rows = [(i, t) for i, t in enumerate([
        "8 t", "2cm- up to 8", "1.5miles", "100 hz",
        "how much are 100 kilobytes", "no units here at all"])]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["d"] for r in df.select(
        "id", U.detect_unit_col("text").alias("d")).collect()}
    for i, t in rows:
        assert got[i] == U.detect_unit(t), t


def test_normalize_amount_cols(spark):
    df = spark.createDataFrame(
        [(65.0, "kg"), (30.0, "mph"), (2.0, "GB"), (7.0, "nope")],
        "v double, u string")
    got = [r["n"] for r in df.select(
        U.normalize_amount_cols("v", "u").alias("n")).collect()]
    assert got[0] == 65000.0
    assert got[1] == pytest.approx(U.java_round(30 * U.unit_lookup("mph"), 3))
    assert got[2] == 2.0 * U.unit_lookup("GB")
    assert got[3] == 7.0   # unknown unit leaves the number unchanged


def test_smart_transform():
    def shortest(names):
        return sorted(names, key=U._length_cmp_key)[-1]
    v, names = U.smart_transform(0.5, "LENGTH")
    assert (v, shortest(names)) == (5.0, "mm")
    v, names = U.smart_transform(5000000.0, "WEIGHT")
    assert (v, shortest(names)) == (5.0, "t")


# ------------------------------------------------- UnitConverter port


def test_convert_reference_examples():
    from kgp.units import convert
    # UnitConverter.main (conversion/UnitConverter.java:121-124)
    assert convert(2., "liters", "ounces") == \
        pytest.approx(70.5479239, abs=1e-4)
    assert convert(2., "kg", "lb") == pytest.approx(4.40924524, abs=1e-6)


def test_convert_temperature_all_pairs():
    from kgp.units import convert, convert_temperature
    assert convert_temperature(100., "celsius", "°f") == 212.0
    assert convert_temperature(212., "°F", "CELSIUS".lower()) == 100.0
    assert convert(0., "°c", "kelvin") == 273.15
    assert convert_temperature(32., "fahrenheit", "kelvin") == \
        pytest.approx(273.15)
    assert convert_temperature(273.15, "K", "°c") == 0.0
    assert convert_temperature(273.15, "kelvin", "°f") == \
        pytest.approx(32.0)
    # same unit falls through unchanged; unknown -> None
    assert convert_temperature(5., "kelvin", "kelvin") == 5.0
    assert convert_temperature(5., "kelvin", "yards") is None
    assert convert_temperature(None, "kelvin", "°c") is None


def test_best_fit_convert():
    from kgp.units import best_fit_convert
    # UnitConverter.main: 600 g over [lb, ounces] -> ~1.32 lb
    amount, unit = best_fit_convert(600., "g", ["lb", "ounces"])
    assert unit == "lb"
    assert amount == pytest.approx(1.3227735, abs=1e-5)
    # below every divisor -> smallest divisor wins
    amount, unit = best_fit_convert(1., "g", ["lb", "kg"])
    assert unit == "lb"


def test_temperature_bank_semantics():
    from kgp.units import get_unit_type, unit_lookup
    assert get_unit_type("celsius") == "TEMPERATURE"
    assert get_unit_type("degrees fahrenheit") == "TEMPERATURE"
    # null multiplier -> -1 (UnitType.java:317 non-linear projections)
    assert unit_lookup("kelvin") == -1.0
    # exact pass hits TEMPERATURE's 'K'; the lowercase pass cannot
    # match uppercase bank names, so 'k' stays the PIXEL kilo-prefix
    assert unit_lookup("K") == -1.0
    assert unit_lookup("k") == 1000.0


def test_multiplier_col_case_semantics(spark):
    from kgp.units import multiplier_col, unit_lookup
    probes = ["MW", "mW", "Mw", "mw", "K", "k", "GB", "gb", "kg."]
    df = spark.createDataFrame([(p,) for p in probes], "u string")
    got = {r["u"]: r["m"] for r in
           df.select("u", multiplier_col("u").alias("m")).collect()}
    for p in probes:
        assert got[p] == unit_lookup(p), p
