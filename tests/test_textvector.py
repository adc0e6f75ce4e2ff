"""Text vectorization & similarity (kgp/textvector.py) — reference
goldens from TextVectorizerTest.java, TfIdfSimilarityTest.java and
FloatVectorUtilTest.java, plus Spark-stage parity vs the pure twins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kgp.textclassifier import FeatureSetting, preprocess
from kgp.textvector import (TermCorpusLocal, _cosine, cosine_vector_similarity,
                            doc_weights_tfidfsim, embedding_vector,
                            embedding_vectorize_stage, fit_term_corpus,
                            read_vec_file, sentence_vector, simple_tokens,
                            tfidf_pair_sim_stage, tfidf_similarity,
                            token_word_mover, vectorize_stage, vectorize_text,
                            word_mover, word_mover_pairs_stage)

WORDS_1_100 = FeatureSetting(mode="word", min_ngram=1, max_ngram=1,
                             min_term_len=1, max_term_len=100,
                             case_sensitive=False)

DOCS = ["The sky is blue.", "The sun is bright today.",
        "The sun in the sky is bright.",
        "We can see the shining sun, the bright sun."]


def _corpus() -> TermCorpusLocal:
    c = TermCorpusLocal()
    for d in DOCS:
        c.add_doc(preprocess(d, WORDS_1_100))
    return c


# ------------------------------------------------- reference goldens


def test_text_vectorizer_binary_unary():
    # TextVectorizerTest.testTextVectorizer_binary
    v = vectorize_text("The sky is blue.", _corpus(), WORDS_1_100,
                       tf="binary", idf="unary")
    assert len(v) == 5
    assert v["sky"] == 1.0 and v["blue"] == 1.0
    assert "bright" not in v


def test_text_vectorizer_count_alpha1():
    # TextVectorizerTest.testTextVectorizer_count_alpha1: alpha > 0
    # switches to the full corpus vocabulary (14 unique terms)
    v = vectorize_text("The sky is blue.", _corpus(), WORDS_1_100,
                       tf="raw_count", idf="unary", alpha=1)
    assert len(v) == 14
    assert v["sky"] == 2.0 and v["bright"] == 1.0


def test_text_vectorizer_tf():
    v = vectorize_text("The sky is blue.", _corpus(), WORDS_1_100,
                       tf="term_frequency", idf="unary")
    assert len(v) == 5
    assert abs(v["sky"] - 1 / 5) < 1e-4


def test_text_vectorizer_tf_idf_smooth():
    v = vectorize_text("The sky is blue.", _corpus(), WORDS_1_100,
                       tf="term_frequency", idf="idf_smooth")
    assert abs(v["sky"] - (1 / 5) * math.log(4 / 3)) < 1e-4


def test_tfidf_similarity_golden():
    # TfIdfSimilarityTest.testTfIdfSimilarity (corpus docs added as
    # SETS, words(1).termLength(3,3).caseSensitive())
    c = TermCorpusLocal()
    c.add_doc(["Z00", "Z01", "Z02", "K01", "K02"])
    c.add_doc(["P00", "P01", "P02", "Z00", "Z00"])
    c.add_doc(["K00", "K00", "K01", "P02", "P00"])
    c.add_doc(["P01", "P01", "Z00", "Z01", "K02"])
    c.add_doc(["P01", "P01", "Z00", "Z01", "K02"])
    fs = FeatureSetting(mode="word", min_ngram=1, max_ngram=1,
                        min_term_len=3, max_term_len=3,
                        case_sensitive=True)
    q = "Z00 Z01 Z02 K01 K02"
    assert abs(tfidf_similarity(q, q, c, fs) - 1.0) < 1e-4
    assert abs(tfidf_similarity(q, "P00 P01 P02 Z00 Z00", c, fs)
               - 0.1999) < 1e-4
    assert abs(tfidf_similarity(q, "K00 K00 K01 P02 P00", c, fs)
               - 0.1559) < 1e-4
    assert abs(tfidf_similarity(q, "P01 P01 Z00 Z01 K02", c, fs)
               - 0.4008) < 1e-4


def test_float_vector_cosine_golden():
    # FloatVectorUtilTest.testCosine
    assert abs(_cosine([2, 0, 1, 1, 0, 2, 1, 1],
                       [2, 1, 1, 0, 1, 1, 1, 1]) - 0.822) < 0.01
    # magnitude golden
    assert abs(math.sqrt(sum(x * x for x in [2, 5, -8, 2, 0]))
               - math.sqrt(4 + 25 + 64 + 4)) < 1e-9


def test_term_corpus_reduced_and_idf():
    c = _corpus()
    # "the" appears in all 4 docs, "sky" in 2
    assert c.get_count("the") == 4 and c.get_count("sky") == 2
    assert abs(c.get_idf("sky", True) - (1 + math.log(4 / 3))) < 1e-9
    r = c.reduced(2)
    # top-2 by (count desc, term asc): 'the'(4), '.'(4) -> '.' < 'the'
    assert set(r.counts) == {".", "the"}
    assert r.num_docs == 4


def test_word_mover_quirks():
    fs = WORDS_1_100
    # identical single-token sets
    assert token_word_mover("sun", "sun", fs) == 1.0
    # empty both -> 1 (reference early-out)
    assert token_word_mover("", "", fs) == 1.0
    # iterates the LARGER set: sim("a b c", "a") averages over 3 terms
    exact = lambda x, y: 1.0 if x == y else 0.0
    assert abs(token_word_mover("aa bb cc", "aa", fs, exact)
               - 1 / 3) < 1e-9

    vecs = {"aa": [1.0, 0.0], "bb": [0.0, 1.0], "cc": [1.0, 1.0]}
    # word_mover iterates the SMALLER list and divides by its size
    assert abs(word_mover("aa bb cc", "aa", vecs) - 1.0) < 1e-9
    # the larger side's extra token is invisible (only the smaller
    # list is iterated)
    assert abs(word_mover("aa zz", "aa", vecs) - 1.0) < 1e-9
    # a dictionary miss in the iterated (smaller) list contributes 0
    assert abs(word_mover("zz", "aa bb", vecs) - 0.0) < 1e-9


def test_sentence_and_embedding_vectors():
    vecs = {"sun": [2.0, 0.0], "sky": [0.0, 2.0]}
    sv = sentence_vector("sun sky", vecs, 2)
    assert abs(sv[0] - 1 / math.sqrt(2)) < 1e-9
    assert abs(cosine_vector_similarity("sun sky", "sun sky", vecs, 2)
               - 1.0) < 1e-9
    # EmbeddingTextVectorizer: mean over ALL tokens (misses count in
    # the denominator), always lowercased
    ev = embedding_vector("Sun zz", vecs, 2)
    assert ev == [1.0, 0.0]


def test_read_vec_file(tmp_path):
    p = tmp_path / "toy.vec"
    p.write_text("alpha 1.0 0.5\nBeta 0.25 -1\n")
    vecs, dim, case_sensitive = read_vec_file(str(p))
    assert dim == 2 and case_sensitive is True
    assert vecs["alpha"] == [1.0, 0.5]
    assert vecs["Beta"] == [0.25, -1.0]


# ------------------------------------------------- Spark stage parity


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], ["doc_id", "text"])


def test_fit_term_corpus_stage(spark, docs_df):
    counts, n = fit_term_corpus(docs_df)
    assert n == 4
    m = {r["term"]: r["doc_count"] for r in counts.collect()}
    # norm_tokens drops punctuation; "the" in all 4 docs
    assert m["the"] == 4 and m["sky"] == 2 and m["blue"] == 1


def test_vectorize_stage_parity(spark, docs_df):
    counts, n = fit_term_corpus(docs_df)
    got = vectorize_stage(docs_df, counts, n, tf="term_frequency",
                          idf="idf_smooth").collect()
    corpus = TermCorpusLocal()
    for d in DOCS:
        corpus.add_doc(simple_tokens(d))
    for r in got:
        want = vectorize_text(DOCS[r["doc_id"]], corpus, WORDS_1_100,
                              tf="term_frequency", idf="idf_smooth",
                              tokenizer=simple_tokens)
        assert abs(r["weight"] - want[r["term"]]) < 1e-9
    # row count: sum of per-doc unique-token counts
    assert len(got) == sum(len(set(simple_tokens(d))) for d in DOCS)


def test_vectorize_stage_alpha_parity(spark, docs_df):
    counts, n = fit_term_corpus(docs_df)
    got = vectorize_stage(docs_df, counts, n, tf="raw_count",
                          idf="unary", alpha=1).collect()
    corpus = TermCorpusLocal()
    for d in DOCS:
        corpus.add_doc(simple_tokens(d))
    vocab = len(corpus.counts)
    assert len(got) == 4 * vocab
    for r in got:
        want = vectorize_text(DOCS[r["doc_id"]], corpus, WORDS_1_100,
                              tf="raw_count", idf="unary", alpha=1,
                              tokenizer=simple_tokens)
        assert abs(r["weight"] - want[r["term"]]) < 1e-9


def test_tfidf_pair_sim_stage_parity(spark, docs_df):
    counts, n = fit_term_corpus(docs_df)
    weights = doc_weights_tfidfsim(docs_df, counts, n)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], ["a_id", "b_id"])
    got = {(r["a_id"], r["b_id"]): r["cosine"]
           for r in tfidf_pair_sim_stage(pairs, weights).collect()}
    corpus = TermCorpusLocal()
    for d in DOCS:
        corpus.add_doc(simple_tokens(d))
    for (a, b), cos in got.items():
        want = tfidf_similarity(DOCS[a], DOCS[b], corpus, WORDS_1_100,
                                tokenizer=simple_tokens)
        assert abs(cos - want) < 1e-9


def test_tfidf_pair_no_shared_terms(spark):
    df = spark.createDataFrame(
        [(0, "apple banana"), (1, "zebra yak")], ["doc_id", "text"])
    counts, n = fit_term_corpus(df)
    weights = doc_weights_tfidfsim(df, counts, n)
    pairs = spark.createDataFrame([(0, 1)], ["a_id", "b_id"])
    [r] = tfidf_pair_sim_stage(pairs, weights).collect()
    assert r["cosine"] == 0.0


def test_word_mover_pairs_stage(spark):
    pairs = spark.createDataFrame(
        [(0, "the blue sky", "the blue sky"),
         (1, "the blue sky", "a green field")],
        ["pair_id", "a_text", "b_text"])
    rows = {r["pair_id"]: r["similarity"]
            for r in word_mover_pairs_stage(pairs, WORDS_1_100).collect()}
    assert abs(rows[0] - 1.0) < 1e-9
    want = token_word_mover("the blue sky", "a green field", WORDS_1_100)
    assert abs(rows[1] - want) < 1e-9


def test_embedding_vectorize_stage(spark):
    vecs = {"sun": [2.0, 0.0], "sky": [0.0, 2.0]}
    df = spark.createDataFrame([(0, "Sun sky"), (1, "")],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r["embedding"]
            for r in embedding_vectorize_stage(df, vecs, 2).collect()}
    assert rows[0] == [1.0, 1.0]
    assert rows[1] == [0.0, 0.0]


def test_vectorize_stage_plan_no_python(spark, docs_df):
    """The norm_tokens path must stay pure JVM (no Python evaluation)
    and the vocabulary join must be a broadcast, not a sort-merge."""
    from tests.test_plans import plan_of
    counts, n = fit_term_corpus(docs_df)
    plan = plan_of(vectorize_stage(docs_df, counts, n))
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_read_word2vec_bin(tmp_path):
    """Word2VecReader quirks: big-endian floats, '_'-words filtered,
    case-sensitivity sniff, inter-record newlines skipped."""
    import struct
    from kgp.textvector import read_word2vec_bin
    p = tmp_path / "toy.bin"
    with open(p, "wb") as fh:
        fh.write(b"3 2\n")
        fh.write(b"alpha " + struct.pack(">2f", 1.0, 0.5))
        fh.write(b"\nBeta " + struct.pack(">2f", 0.25, -1.0))
        fh.write(b"\nsome_compound " + struct.pack(">2f", 9.0, 9.0))
    vecs, dim, cs = read_word2vec_bin(str(p))
    assert dim == 2 and cs is True
    assert vecs["alpha"] == [1.0, 0.5]
    assert vecs["Beta"] == [0.25, -1.0]
    assert "some_compound" not in vecs


def test_fit_with_palladian_preprocessor_tokens(spark, docs_df):
    """The Arrow token UDF path (preprocess_tokens_udf) fits the same
    corpus as the pure Preprocessor."""
    from kgp.textvector import preprocess_tokens_udf
    counts, n = fit_term_corpus(
        docs_df, tokens=preprocess_tokens_udf(WORDS_1_100))
    got = {r["term"]: r["doc_count"] for r in counts.collect()}
    want = TermCorpusLocal()
    for d in DOCS:
        want.add_doc(preprocess(d, WORDS_1_100))
    assert got == want.counts and n == want.num_docs


def test_term_corpus_save_load_roundtrip(tmp_path):
    """MapTermCorpus gzip text format: numDocs header, term#count
    rows; malformed lines skipped on load."""
    import gzip
    from kgp.textvector import load_term_corpus, save_term_corpus
    c = _corpus()
    p = str(tmp_path / "corpus.gz")
    save_term_corpus(c, p)
    back = load_term_corpus(p)
    assert back.counts == c.counts and back.num_docs == c.num_docs
    # malformed line is skipped like the reference's split-length check
    with gzip.open(p, "at", encoding="utf-8") as fh:
        fh.write("not a valid line without separator\n")
    assert load_term_corpus(p).counts == c.counts
