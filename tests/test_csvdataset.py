"""CsvDatasetReader port tests (CsvDatasetReader.java:53-240)."""

import math

import pytest

from kgp.sources import detect_csv_types, read_csv_dataset


def test_detect_types():
    assert detect_csv_types(["true", "False", "1.5", "-3", "x", "?",
                             "2.0d", "Infinity"]) == \
        ["boolean", "boolean", "double", "double", "string", "string",
         "double", "double"]


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("age;income;member;city;label\n"
                 "25;50000.5;true;Dresden;yes\n"
                 "40;?;false;Berlin;no\n"
                 "31;12.25;true;?;yes\n")
    return str(p)


def test_read_defaults(spark, csv_file):
    df = read_csv_dataset(spark, csv_file)
    assert df.columns == ["age", "income", "member", "city",
                          "category"]
    assert dict(df.dtypes) == {"age": "double", "income": "double",
                               "member": "boolean", "city": "string",
                               "category": "string"}
    rows = sorted(df.collect(), key=lambda r: r.age)
    assert rows[0].age == 25.0 and rows[0].member is True
    assert rows[1].income == 12.25 and rows[1].city is None
    assert rows[2].income is None          # '?' -> null
    assert rows[2].category == "no"


def test_read_no_header_skip_and_limit(spark, tmp_path):
    p = tmp_path / "nh.csv"
    p.write_text("1;a;x\n2;b;y\n3;c;z\n")
    df = read_csv_dataset(spark, str(p), read_header=False,
                          skip_columns=("c1",), limit=2)
    assert df.columns == ["c0", "category"]
    assert df.count() == 2
    assert dict(df.dtypes)["c0"] == "double"


def test_read_trim_and_separator(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("v,lab\n 1.5 ,ok\n")
    df = read_csv_dataset(spark, str(p), field_separator=",",
                          trim=True)
    assert df.collect()[0].v == 1.5


# ------------------- the reference's OWN CsvDatasetReaderTest cases
RES = "/root/reference/palladian-core/src/test/resources"


def test_reference_adult_data(spark):
    """testCsvReading (CsvDatasetReaderTest.java): adultData.txt, no
    header, ';', class from last column — 14 features + category,
    first row 0 -> 25.0 / 1 -> 'Private' / '<=50K', 1000 rows."""
    df = read_csv_dataset(spark, f"{RES}/classifier/adultData.txt",
                          read_header=False)
    assert len(df.columns) == 15
    assert df.columns[-1] == "category"
    first = df.limit(1).collect()[0]
    assert first.c0 == 25.0
    assert first.c1 == "Private"
    assert first.category == "<=50K"
    assert df.count() == 1000


def test_reference_adult_without_class(spark):
    df = read_csv_dataset(spark, f"{RES}/classifier/adultData.txt",
                          read_header=False,
                          read_class_from_last_column=False)
    assert df.columns[-1] == "c14"
    assert df.limit(1).collect()[0].c14 == "<=50K"


def test_reference_diabetes_header(spark):
    """testCsvReading_header: diabetes2.csv with header — 8 features,
    'numPregnant' present, 768 rows."""
    df = read_csv_dataset(spark, f"{RES}/classifier/diabetes2.csv")
    assert len(df.columns) == 9
    assert "numPregnant" in df.columns
    assert df.count() == 768


def test_reference_special_values(spark):
    """testCsvReading_specialValues: 1.23 / 123 / 'test' / NaN /
    +-Infinity / '?' -> null."""
    df = read_csv_dataset(spark, f"{RES}/csvDatasetSpecialValues.csv",
                          read_class_from_last_column=False)
    r = df.collect()[0]
    assert r.double == 1.23
    assert r.long == 123.0
    assert r.string == "test"
    assert math.isnan(r.NaN)
    assert r.positiveInfinity == float("inf")
    assert r.negativeInfinity == float("-inf")
    assert r.null is None


def test_reference_skip_columns(spark):
    df = read_csv_dataset(spark, f"{RES}/csvDatasetSpecialValues.csv",
                          read_class_from_last_column=False,
                          skip_columns=("NaN", "null"))
    assert len(df.columns) == 5 and "NaN" not in df.columns
