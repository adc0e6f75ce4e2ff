"""PhraseChunker port (kgp.chunk): base NP/VP/PP chunking over the
PalladianPosTagger tags, B-/I- run joining per
OpenNlpPhraseChunker.java:83-103, and the NP-VP-NP clause relation
source."""

from __future__ import annotations

from kgp.chunk import (chunk_iob, clause_triples, extract_chunk_relations,
                       join_chunks, phrase_chunk, tag_class, tagged_string)
from kgp.postag import parse_brown, train_pos_model_local

# Brown-format training slice sized so the tagger nails the chunk
# test sentences (tags normalized like AbstractPosTagger: suffix after
# '-' stripped, uppercased on output).
_BROWN = """
The/AT dog/NN runs/VBZ quickly/RB ./.
A/AT cat/NN sleeps/VBZ ./.
The/AT big/JJ bird/NN sings/VBZ ./.
Acme/NP Corp/NP acquired/VBD Initech/NP ./.
Death/NN toll/NN rises/VBZ after/IN Indonesia/NP tsunami/NN ./.
He/PPS will/MD quickly/RB run/VB ./.
Seven/CD dogs/NNS run/VB in/IN the/AT park/NN ./.
She/PPS walks/VBZ slowly/RB ./.
John/NP Smith/NP founded/VBD Acme/NP Corp/NP ./.
Globex/NP bought/VBD the/AT old/JJ factory/NN ./.
"""


def _model():
    return train_pos_model_local(parse_brown(_BROWN))


def test_tag_classes():
    assert tag_class("AT") == "D"
    assert tag_class("NNS") == "N"
    assert tag_class("VBD") == "V"
    assert tag_class("MD") == "M"
    assert tag_class("IN") == "I"
    assert tag_class(".") == "O"


def test_chunk_iob_np_vp():
    # "The big bird sings ." -> [NP The big bird] [VP sings] O
    assert chunk_iob(["AT", "JJ", "NN", "VBZ", "."]) == [
        "B-NP", "I-NP", "I-NP", "B-VP", "O"]


def test_chunk_iob_adverb_between_verbs_stays_in_vp():
    # "will quickly run" keeps the adverb inside the VP;
    # "runs quickly" pushes it out to ADVP
    assert chunk_iob(["MD", "RB", "VB"]) == ["B-VP", "I-VP", "I-VP"]
    assert chunk_iob(["VBZ", "RB"]) == ["B-VP", "B-ADVP"]


def test_chunk_iob_pp_and_cardinals():
    # "Seven dogs run in the park" -> NP VP PP NP
    assert chunk_iob(["CD", "NNS", "VB", "IN", "AT", "NN"]) == [
        "B-NP", "I-NP", "B-VP", "B-PP", "B-NP", "I-NP"]


def test_join_chunks_exact_offsets_for_repeated_phrase():
    # the documented deviation from OpenNlpPhraseChunker.java:100
    # (sentence.indexOf): the SECOND "the dog" must keep its own offset
    text = "the dog saw the dog"
    anns = [{"start": 0, "value": "the"}, {"start": 4, "value": "dog"},
            {"start": 8, "value": "saw"}, {"start": 12, "value": "the"},
            {"start": 16, "value": "dog"}]
    iob = ["B-NP", "I-NP", "B-VP", "B-NP", "I-NP"]
    got = join_chunks(text, anns, iob)
    assert got == [
        {"start": 0, "value": "the dog", "tag": "NP"},
        {"start": 8, "value": "saw", "tag": "VP"},
        {"start": 12, "value": "the dog", "tag": "NP"},
    ]


def test_phrase_chunk_end_to_end():
    got = phrase_chunk("Acme Corp acquired Initech .", _model())
    assert tagged_string(got) == \
        "[NP Acme Corp ] [VP acquired ] [NP Initech ]"
    assert got[0]["start"] == 0
    assert got[1]["start"] == 10
    assert got[2]["start"] == 19


def test_phrase_chunk_reference_demo_sentence():
    # PhraseChunker.java:38 demo sentence (minus the final period)
    got = phrase_chunk("Death toll rises after Indonesia tsunami .",
                       _model())
    tags = [(c["tag"], c["value"]) for c in got]
    assert tags == [("NP", "Death toll"), ("VP", "rises"),
                    ("PP", "after"), ("NP", "Indonesia tsunami")]


def test_clause_triples_np_vp_np():
    sent = "Acme Corp acquired Initech ."
    chunks = phrase_chunk(sent, _model())
    mentions = [
        {"start": 0, "end": 9, "canon_name": "Acme Corp", "entity_id": 1},
        {"start": 19, "end": 26, "canon_name": "Initech", "entity_id": 2},
    ]
    got = clause_triples(sent, 0, mentions, chunks)
    # "acquired" -> "acquir": WordTransformer.getSimplePresent strips a
    # trailing -ed naively (WordTransformer.java:683-685) — faithful
    assert [(t["subj"], t["pred"], t["obj"]) for t in got] == [
        ("Acme Corp", "acquir", "Initech")]
    assert got[0]["subj_id"] == 1 and got[0]["obj_id"] == 2


def test_clause_triples_requires_single_vp_between():
    sent = "Acme Corp acquired Initech ."
    chunks = phrase_chunk(sent, _model())
    # mentions in the same NP -> no triple
    mentions = [
        {"start": 0, "end": 9, "canon_name": "Acme Corp", "entity_id": 1},
        {"start": 0, "end": 4, "canon_name": "Acme", "entity_id": 3},
    ]
    assert clause_triples(sent, 0, mentions, chunks) == []


def test_extract_chunk_relations_spark(spark):
    model = _model()
    bc = spark.sparkContext.broadcast(model)
    sent = "Globex bought the old factory ."
    rows = [
        ("u1", 0, 0, 6, "Globex", "ORG", 0, sent, 7, "Globex", 1.0),
        ("u1", 0, 14, 29, "the old factory", "MISC", 0, sent, 9,
         "Old Factory", 1.0),
    ]
    links = spark.createDataFrame(
        rows,
        "url string, sent_idx int, start int, end int, surface string, "
        "tag string, sent_start int, sent_text string, entity_id long, "
        "canon_name string, link_score double")
    got = extract_chunk_relations(links, bc, num_buckets=2).collect()
    assert [(t["subj"], t["pred"], t["obj"]) for t in got] == [
        ("Globex", "buy", "Old Factory")]
