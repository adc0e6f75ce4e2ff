"""PhraseChunker — base NP/VP/PP chunking over PalladianPosTagger tags.

Reference surface:
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/phrase/PhraseChunker.java:11-27
 — `chunk(sentence) -> List<Annotation>` where each annotation is a
   phrase span with tag NP/VP/PP/... The reference's shipped
   implementations (palladian-external OpenNlpPhraseChunker.java:66-104,
   LingPipePhraseChunker.java) wrap external ML models we can't ship;
   this port keeps the interface and the B-/I- run-joining output
   semantics (OpenNlpPhraseChunker.java:83-103) but derives the IOB
   labels from a deterministic base-chunk grammar over the Brown POS
   tags produced by kgp.postag (PalladianPosTagger port) — the classic
   Abney chunker shape.

Deviation (documented): OpenNlpPhraseChunker.java:100 rebuilds the
phrase with single spaces and locates it via `sentence.indexOf`, which
mis-offsets repeated or oddly-spaced phrases; we slice the original
text between the first and last token so offsets are always exact.

Spark-first: chunking is document-local — one pandas UDF with the
broadcast POS model, zero shuffle (chunk_stage). The chunk-based
relation extractor reuses the bucketed applyInPandas shape of
kgp.relations.extract_relations.
"""

from __future__ import annotations

import pandas as pd
import regex
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgp.postag import PosModel, pos_tag

# Brown tagset → chunk grammar class chars. Tags arrive normalized
# (suffix after '-' stripped, uppercased — AbstractPosTagger.java:72-74).
# D determiner/article  P possessive pronoun  J adjective/ordinal
# C cardinal  N noun/proper/pronoun  M modal  V verb (incl. be/have/do)
# R adverb/qualifier  I preposition/'to'  O other
_CLASS_BY_TAG = {
    "AT": "D", "DT": "D", "DTI": "D", "DTS": "D", "DTX": "D",
    "ABN": "D", "ABX": "D", "AP": "D", "WDT": "D",
    "PP$": "P", "PP$$": "P", "PRP$": "P",
    "JJ": "J", "JJR": "J", "JJS": "J", "JJT": "J", "OD": "J",
    "CD": "C",
    "NN": "N", "NNS": "N", "NP": "N", "NPS": "N", "NR": "N",
    "NRS": "N", "PN": "N", "PPS": "N", "PPSS": "N", "PPO": "N",
    "EX": "N",
    "MD": "M",
    "VB": "V", "VBD": "V", "VBG": "V", "VBN": "V", "VBZ": "V",
    "BE": "V", "BED": "V", "BEDZ": "V", "BEG": "V", "BEM": "V",
    "BEN": "V", "BER": "V", "BEZ": "V",
    "DO": "V", "DOD": "V", "DOZ": "V",
    "HV": "V", "HVD": "V", "HVG": "V", "HVN": "V", "HVZ": "V",
    "RB": "R", "RBR": "R", "RBT": "R", "RN": "R", "QL": "R",
    "QLP": "R",
    "IN": "I", "TO": "I",
}

# Base-chunk grammar, longest match wins, tried in order at each
# unconsumed token. NP = det/poss* num/adj* noun+ (a bare pronoun or
# cardinal-noun compound chunks too); VP = verbs/modals with adverbs
# allowed strictly BETWEEN verbal heads ("will quickly run"); trailing
# adverbs go to ADVP ("runs quickly" -> [VP runs] [ADVP quickly]).
_GRAMMAR: list[tuple[str, "regex.Pattern"]] = [
    ("NP", regex.compile(r"[DP]*[JC]*N+")),
    ("VP", regex.compile(r"[MV](?:R*[MV])*")),
    ("PP", regex.compile(r"I")),
    ("ADVP", regex.compile(r"R+")),
]


def tag_class(tag: str) -> str:
    return _CLASS_BY_TAG.get(tag, "O")


def chunk_iob(tags: list[str]) -> list[str]:
    """IOB labels for a normalized-Brown-tag sequence: the label stream
    the OpenNLP model produces (B-NP/I-NP/O), derived from _GRAMMAR by
    a deterministic leftmost-longest scan."""
    classes = "".join(tag_class(t) for t in tags)
    out = ["O"] * len(tags)
    i = 0
    while i < len(classes):
        best = None
        for name, pat in _GRAMMAR:
            m = pat.match(classes, i)
            if m and m.end() > i and \
                    (best is None or m.end() > best[1]):
                best = (name, m.end())
        if best is None:
            i += 1
            continue
        name, end = best
        out[i] = "B-" + name
        for j in range(i + 1, end):
            out[j] = "I-" + name
        i = end
    return out


def join_chunks(text: str, annotations: list[dict],
                iob: list[str]) -> list[dict]:
    """B-/I- run joining (OpenNlpPhraseChunker.java:83-103): consecutive
    I- tokens append to the open B- chunk; each chunk emits one
    annotation {start, value, tag}. O tokens are skipped (the reference
    emits them with the stale previous tag — a quirk its own tests
    never exercise; we drop them)."""
    out: list[dict] = []
    run: list[dict] = []
    run_tag = ""

    def flush() -> None:
        if not run:
            return
        start = run[0]["start"]
        end = run[-1]["start"] + len(run[-1]["value"])
        out.append({"start": start, "value": text[start:end],
                    "tag": run_tag})

    for ann, label in zip(annotations, iob):
        if label.startswith("B-"):
            flush()
            run, run_tag = [ann], label[2:]
        elif label.startswith("I-") and run:
            run.append(ann)
        else:
            flush()
            run, run_tag = [], ""
    flush()
    return out


def phrase_chunk(text: str, model: PosModel) -> list[dict]:
    """PhraseChunker.chunk port: POS-tag the sentence, derive IOB,
    join runs. Returns [{start, value, tag}] with tag in
    NP/VP/PP/ADVP."""
    tagged = pos_tag(text, model)
    iob = chunk_iob([t["tag"] for t in tagged])
    return join_chunks(text, tagged, iob)


def tagged_string(chunks: list[dict]) -> str:
    """TagAnnotations.getTaggedString flavor: '[NP Death toll ] [VP
    rises ]' — the debug format the reference logs
    (PhraseChunker.java:38)."""
    return " ".join(f"[{c['tag']} {c['value']} ]" for c in chunks)


_CHUNK_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("start", T.IntegerType()),
    T.StructField("value", T.StringType()),
    T.StructField("tag", T.StringType()),
]))


def chunk_stage(docs: DataFrame, model_bc,
                text_col: str = "text") -> DataFrame:
    """docs + `chunks` column — document-local pandas UDF with the
    broadcast POS model, no shuffle."""
    @F.pandas_udf(_CHUNK_SCHEMA)
    def chunk_udf(texts: pd.Series) -> pd.Series:
        m = model_bc.value
        return texts.map(lambda t: phrase_chunk(t or "", m))

    return docs.withColumn("chunks", chunk_udf(text_col))


# --------------------------------------------- chunk-based relations
# VERDICT r2 "what's missing" #6: relation patterns beyond anchored
# infixes. An NP-VP-NP clause whose NPs cover two linked mentions
# yields a candidate triple with the VP's verbal content as predicate
# — catches phrasings the infix bank has never seen ("Acme acquired
# Initech"). Predicate surface goes through the same WordTransformer
# normalization as the pattern bank.

_WORD_RE = regex.compile(r"[a-z]+")


def clause_triples(sent_text: str, sent_start: int,
                   mentions: list[dict], chunks: list[dict],
                   max_np_gap: int = 0) -> list[dict]:
    """NP-VP-NP clause extraction over one sentence. A triple fires
    when a VP chunk sits between two NP chunks (adjacent chunk-wise,
    allowing `max_np_gap` intervening non-NP chunks such as a PP) and
    each NP contains a linked mention."""
    if not chunks:
        return []
    by_np: list[tuple[int, dict]] = []   # (chunk idx, mention)
    for m in mentions:
        lo, hi = m["start"] - sent_start, m["end"] - sent_start
        for ci, c in enumerate(chunks):
            if c["tag"] == "NP" and c["start"] <= lo \
                    and hi <= c["start"] + len(c["value"]):
                by_np.append((ci, m))
                break
    out = []
    for i, (ci, subj) in enumerate(by_np):
        for cj, obj in by_np:
            if cj <= ci:
                continue
            between = chunks[ci + 1:cj]
            vps = [c for c in between if c["tag"] == "VP"]
            rest = [c for c in between if c["tag"] not in ("VP",)]
            if len(vps) != 1 or len(rest) > max_np_gap + 1:
                continue
            words = _WORD_RE.findall(vps[0]["value"].lower())
            if not words:
                continue
            from kgp.predicates import normalize_predicate_name
            pred = normalize_predicate_name("_".join(words))
            out.append({
                "subj": subj["canon_name"], "pred": pred,
                "obj": obj["canon_name"],
                "subj_id": subj.get("entity_id"),
                "obj_id": obj.get("entity_id"),
                "conf": 0.6,
            })
    return out


def extract_chunk_relations(links: DataFrame, pos_model_bc,
                            num_buckets: int | None = None) -> DataFrame:
    """links → clause triples, same bucketed applyInPandas shape (and
    output schema) as kgp.relations.extract_relations so the two
    sources union cleanly."""
    from kgp.relations import TRIPLE_SCHEMA

    spark = links.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism * 4

    def _rel(pdf: pd.DataFrame) -> pd.DataFrame:
        model = pos_model_bc.value
        rows: list[dict] = []
        chunk_cache: dict[str, list[dict]] = {}

        def flush(group: list) -> None:
            if len(group) < 2:
                return
            first = group[0]
            key = f"{first.url}\x00{first.sent_idx}"
            chunks = chunk_cache.get(key)
            if chunks is None:
                chunks = phrase_chunk(first.sent_text, model)
                chunk_cache[key] = chunks
            mentions = [{
                "start": t.start, "end": t.end,
                "canon_name": t.canon_name,
                "entity_id": None if pd.isna(t.entity_id)
                else int(t.entity_id),
            } for t in group]
            for tr in clause_triples(first.sent_text,
                                     int(first.sent_start),
                                     mentions, chunks):
                tr["url"] = first.url
                tr["sent_idx"] = int(first.sent_idx)
                rows.append(tr)

        pdf = pdf.sort_values(["url", "sent_idx", "start", "end"],
                              kind="mergesort")
        cur_key, cur = None, []
        for t in pdf.itertuples():
            key = (t.url, t.sent_idx)
            if key != cur_key:
                flush(cur)
                cur, cur_key = [], key
            cur.append(t)
        flush(cur)
        return pd.DataFrame(rows,
                            columns=[f.name for f in TRIPLE_SCHEMA.fields])

    bucketed = links.withColumn("_bucket",
                                F.pmod(F.xxhash64("url"), F.lit(n)))
    out = bucketed.groupBy("_bucket").applyInPandas(_rel, TRIPLE_SCHEMA)
    from kgp.predicates import normalize_predicates
    return normalize_predicates(out)
