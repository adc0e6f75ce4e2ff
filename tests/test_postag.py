"""PalladianPosTagger port (kgp.postag): UniversalClassifier = char-gram
text classifier + naive Bayes over the 12 nominal token features."""

from __future__ import annotations

from kgp.postag import (classify_token, extract_pos_features,
                        is_number_or_number_word, parse_brown, pos_tag,
                        pos_tag_stage, train_pos_model,
                        train_pos_model_local)

# tiny Brown-format corpus ("word/TAG", tag suffixes stripped like
# AbstractPosTagger.normalizeTag)
_BROWN = """
The/AT-TL dog/NN runs/VBZ ./.
A/AT cat/NN sleeps/VBZ ./.
The/AT bird/NN sings/VBZ ./.
A/AT fox/NN jumps/VBZ ./.
The/AT man/NN walks/VBZ quickly/RB ./.
A/AT woman/NN talks/VBZ slowly/RB ./.
Seven/CD dogs/NNS run/VB ./.
Three/CD cats/NNS sleep/VB ./.
Nine/CD birds/NNS sing/VB ./.
"""


def test_parse_brown_normalizes_tags():
    pairs = parse_brown("The/AT-TL dog/NN ./.")
    assert pairs == [("The", "AT"), ("dog", "NN"), (".", ".")]
    assert parse_brown("word notag /NN") == []


def test_extract_features_reference_set():
    f = extract_pos_features("Running")
    assert f["startsUppercase"] == "true"
    assert f["length"] == "7"
    assert f["lastTwoCharacters"] == "ng"
    assert f["firstCharacter"] == "R"
    assert f["number"] == "false"
    assert f["completelyUppercase"] == "false"
    assert extract_pos_features("USA")["completelyUppercase"] == "true"
    assert extract_pos_features("3.55")["number"] == "true"
    assert extract_pos_features("seven")["number"] == "true"
    assert len(f) == 12


def test_is_number_or_number_word():
    assert is_number_or_number_word("12,345.6")
    assert is_number_or_number_word("-3")
    assert not is_number_or_number_word(".5")
    assert not is_number_or_number_word("5.")
    assert is_number_or_number_word("Twelve")
    assert not is_number_or_number_word("dog")


def test_pos_tagging_learns_and_generalizes():
    model = train_pos_model_local(parse_brown(_BROWN))
    tagged = pos_tag("The catbird gallops .", model)
    tags = [t["tag"] for t in tagged]
    assert tags[0] == "AT"           # seen determiner
    assert tags[1] == "NN"           # unseen noun via shared grams
    assert tags[2] == "VBZ"          # unseen verb via -s suffix
    assert tags[3] == "."
    # offsets are token-accurate (AbstractPosTagger keeps positions)
    assert tagged[1]["start"] == 4 and tagged[1]["value"] == "catbird"
    # tags come out uppercased (AbstractPosTagger.java:41)
    assert all(t["tag"] == t["tag"].upper() for t in tagged)


def test_number_token_tagged_cd():
    model = train_pos_model_local(parse_brown(_BROWN))
    scores = classify_token("Eight", model)
    assert max(scores, key=scores.get) == "CD"


def test_distributed_training_matches_local(spark):
    pairs = parse_brown(_BROWN)
    local = train_pos_model_local(pairs)
    dist = train_pos_model(
        spark.createDataFrame(pairs, "word string, tag string"))
    assert dist.tag_counts == local.tag_counts
    assert dist.text_model.entries == local.text_model.entries
    assert dist.nominal_counts == local.nominal_counts
    text = "A fox sings ."
    assert pos_tag(text, dist) == pos_tag(text, local)


def test_pos_stage_dataframe(spark):
    model = train_pos_model_local(parse_brown(_BROWN))
    bc = spark.sparkContext.broadcast(model)
    docs = spark.createDataFrame([("u1", "The dog runs .")],
                                 "url string, text string")
    row = pos_tag_stage(docs, bc).first()
    assert [p.tag for p in row.pos] == ["AT", "NN", "VBZ", "."]
