"""SynonymDictionary / SynonymDictionaryCreator port tests — both
file-format walks, the self-seeding dictionary quirk, JVM-stage vs
twin parity, and synonym-group canonicalization via string CC."""

from __future__ import annotations

from kgp.synonyms import (SynonymDictionary, demo_thesaurus_df,
                          demo_thesaurus_lines, open_thesaurus_pairs_stage,
                          parse_open_office, parse_open_thesaurus,
                          synonym_groups, thesaurus_pairs)


# ------------------------------------------------------------ dictionary


def test_dictionary_self_seeding_get():
    d = SynonymDictionary()
    assert d.get("alpha") == ["alpha"]  # inserts on miss
    assert "alpha" in d
    d.add_synonym("alpha", "beta")
    d.add_synonym("alpha", "beta")  # deduped
    d.add_synonym("alpha", "alpha")  # self already at head
    assert d["alpha"] == ["alpha", "beta"]


# ------------------------------------------------------------ openoffice


def test_parse_open_office_walk():
    lines = [
        "ISO8859-1",
        "car|2",
        "(noun)|auto|machine",
        "(verb)|drive|steer",
        "house|1",
        "(noun)|home|(noun) dwelling",
    ]
    d = parse_open_office(lines)
    # disallowed (verb) BREAKS its line: drive/steer never added
    assert d["car"] == ["car", "auto", "machine"]
    # parts starting with '(' are never added as synonyms
    assert d["house"] == ["house", "home"]
    assert "drive" not in str(d.get("car"))


def test_parse_open_office_trailing_pipe_and_trim():
    d = parse_open_office(["word|x", "(noun)| padded |"])
    # Java split drops the trailing empty; synonym is trimmed
    assert d["word"] == ["word", "padded"]


# ---------------------------------------------------------- openthesaurus


def test_parse_open_thesaurus_rules():
    lines = [
        "# comment",
        "",
        "lower;skipped",
        "Alpha (x);Beta",
        "Gamma;Gamma",          # equal parts -> nothing
        "  Delta ; Delta Prime  ",
        "???;!!!",              # trims to empty -> skipped
    ]
    d = parse_open_thesaurus(lines)
    assert d["alpha"] == ["alpha", "beta"]
    assert d["beta"] == ["beta", "alpha"]
    assert "gamma" not in d
    assert d["delta"] == ["delta", "delta prime"]
    assert "lower" not in d
    # nouns_only off keeps lowercase lines
    d2 = parse_open_thesaurus(["lower;kept"], nouns_only=False)
    assert d2["lower"] == ["lower", "kept"]


def test_parse_open_thesaurus_interior_empty_quirk():
    # 'A;;B' keeps the interior empty part (Java split only drops
    # trailing empties) -> '' becomes a word/synonym, bug-for-bug
    d = parse_open_thesaurus(["Abc;;Def"])
    assert d["abc"] == ["abc", "", "def"]
    assert d[""] == ["", "abc", "def"]


def test_thesaurus_pairs_order():
    d = parse_open_thesaurus(["Alpha;Beta;Gamma"])
    assert thesaurus_pairs(d) == [
        ("alpha", "beta"), ("alpha", "gamma"),
        ("beta", "alpha"), ("beta", "gamma"),
        ("gamma", "alpha"), ("gamma", "beta")]


# ------------------------------------------------------------ Spark side


def test_stage_matches_twin_on_demo_and_hostile(spark):
    hostile = ["Abc;;Def", "X (a)(b);Y", "Trail;", "  ", "#x;y",
               "Ünïcode;Ümlaut", "A;B;C;A"]
    lines = demo_thesaurus_lines() + hostile
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    got = {(r["word"], r["synonym"])
           for r in open_thesaurus_pairs_stage(df).collect()}
    want = set(thesaurus_pairs(parse_open_thesaurus(lines)))
    assert got == want


def test_stage_plan_no_python_no_early_exchange(spark):
    df = demo_thesaurus_df(spark)
    plan = open_thesaurus_pairs_stage(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_synonym_groups_string_cc(spark):
    pairs = open_thesaurus_pairs_stage(demo_thesaurus_df(spark))
    groups = {r["word"]: r["canon_word"]
              for r in synonym_groups(pairs).collect()}
    # the Acme chain merges transitively to the lexicographic min
    assert groups["acme corporation"] == "acme corp"
    assert groups["acme corp worldwide"] == "acme corp"
    assert groups["acme corp"] == "acme corp"
    # city variants pair up
    assert groups["springfield city"] == "springfield"
    # skipped lines contribute nothing
    assert "lowercase" not in groups
