"""Tokenization and sentence splitting (reference-semantics port).

Pure-Python text functions executed inside vectorized pandas UDFs (the
Spark stage wrappers live in kgp.html_text / kgp.mentions). Semantics
re-derived from the reference:

  * word tokens:   Tokenizer.TOKEN_SPLIT_REGEX
    (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/token/Tokenizer.java:27)
  * sentences:     PalladianSentenceDetector.iterateTokens — mask URLs /
    dotted dates / smileys with 'M', split the masked text with
    SENTENCE_SPLIT_REGEX_EN/_DE, re-project spans onto the original text
    (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/sentence/PalladianSentenceDetector.java:72-118)
  * "real" sentence filter: Tokenizer.getSentences(onlyRealSentences)
    (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/token/Tokenizer.java:298-341)

Java-regex constructs (variable-width lookbehind, \\p{L}) need the
`regex` module; Java's \\w/\\s are ASCII so they are spelled out.
"""

from __future__ import annotations

from typing import NamedTuple

import regex


class Token(NamedTuple):
    start: int
    value: str

    @property
    def end(self) -> int:
        return self.start + len(self.value)


_W = "A-Za-z0-9_"  # Java \w (non-unicode default)

# port of Tokenizer.TOKEN_SPLIT_REGEX (Tokenizer.java:27)
TOKEN_SPLIT_PATTERN = regex.compile(
    r"(?:[A-Z][a-z]?\.)+"            # abbreviations A.B., Mr.
    r"|[\p{L}" + _W + r"+]+(?:[-.,][\p{L}" + _W + r"]+)*"  # words/compounds
    r"|\.[\p{L}" + _W + r"]+"        # .Net style
    r"|</?[\p{L}" + _W + r"]+>"      # tags
    r"|\$[0-9]+\.[0-9]+"             # money
    r"|[^" + _W + r" \t\n\x0b\f\r<]+"  # punctuation runs
)

# port of SENTENCE_SPLIT_REGEX_EN / _DE (Tokenizer.java:30-31)
SENTENCE_SPLIT_EN = regex.compile(
    "(?<!(\\.|\\()|([A-Z]\\.[A-Z]){1,10}|St|Mr|mr|Vers|Dr|dr|Prof|Nr|Rev"
    "|Mrs|mrs|Jr|jr|vs| eg|e\\.g|ca|max|Min|etc| sq| ft)"
    "((\\.|\\?|\\!)(’|”|\")+(?=\\s+[A-Z])|\\.|\\?+|\\!+)"
    "(?!(\\.|[0-9]|\"|”|'|\\)|[!?]|(com|de|fr|uk|au|ca|cn|org|net)/?\\s"
    "|\\()|[A-Za-z]{1,15}\\.|[A-Za-z]{1,15}\\(\\))"
)
SENTENCE_SPLIT_DE = regex.compile(
    "(?<!(\\.|\\()|([A-Z]\\.[A-Z]){1,10}|St|[mM]r|[dD]r|Ca|Mio|Mind|u\\.A"
    "|Inkl|Vers|Prof|[mM]s|zusätzl|äquiv|komp|quiet|elektr\\.|[jJ]r|vs|ca"
    "|engl|evtl|max|mind.|etc|Nr|Rev| sog| ident|bzw|i\\.d\\.R|v\\.a"
    "|u\\.v\\.m|o\\.k|zzgl|Min|Keyb|Elec|bspw|bsp|m\\.E|bezügl|bzgl|inkl"
    "|exkl|ggf|z\\.\\s?[bB]| max| min|\\s[a-z]|u\\.s\\.w|u\\.\\s?a|d\\.h)"
    "((\\.|\\?|\\!)(”|\")\\s[A-Z]|\\.|\\?+|\\!+)"
    "(?!(\\.|[0-9]|\"|”|'|\\)| B\\.|[!?]|(com|de|fr|uk|au|ca|cn|org|net)/?\\s"
    "|\\()|[A-Za-z]{1,15}\\.|[A-Za-z]{1,15}\\(\\))"
)

# URL masking — adapted daringfireball pattern, same shape as
# UrlHelper.URL_PATTERN (/root/reference/palladian-commons/src/main/java/ws/palladian/helper/UrlHelper.java:107-110)
_TLDS = ("com|org|net|edu|gov|mil|int|io|de|fr|uk|au|ca|cn|es|it|nl|se|ch"
         "|at|jp|ru|us|info|biz")
URL_PATTERN = regex.compile(
    r"\b(?:https?://)?(?:[0-9a-zäöü-]{1,63}\.)+(?:" + _TLDS + r")"
    r"(?:[?/][^\s()<>\[\]\"']{0,255}|/|\b)",
    regex.IGNORECASE,
)

# dotted-date masking — the DATES_WITH_DOTS subset used by the sentence
# detector (PalladianSentenceDetector.java:42-54); EU numeric + month-name
# forms are what matter for not breaking sentences at date dots.
_MONTHS = ("January|February|March|April|May|June|July|August|September"
           "|October|November|December|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep"
           "|Sept|Oct|Nov|Dec")
DATE_DOTTED_PATTERNS = [
    regex.compile(r"\b[0-3]?[0-9]\.[01]?[0-9]\.(?:[0-9]{4}|[0-9]{2})\b"),
    regex.compile(r"\b[0-3]?[0-9]\.[01]?[0-9]\.(?!\d)"),
    regex.compile(r"\b[0-3]?[0-9]\.\s?(?:" + _MONTHS + r")\s?[0-9]{0,4}\b"),
    regex.compile(r"\b(?:" + _MONTHS + r")\s[0-3]?[0-9](?:st|nd|rd|th)?\."
                  r"\s?[0-9]{0,4}\b"),
]

# SmileyTagger's emoticon set (SmileyTagger.java:19-27)
SMILEYS = [":-)", ":)", ":-(", ":(", ";-)", ";)", ":-D", ":D"]
SMILEY_PATTERN = regex.compile(
    "|".join(regex.escape(s) for s in sorted(SMILEYS, key=len, reverse=True)))

MASK_CHARACTER = "M"


def iterate_tokens(text: str) -> list[Token]:
    """Word tokens with offsets (WordTokenizer.iterateTokens port)."""
    return [Token(m.start(), m.group()) for m in
            TOKEN_SPLIT_PATTERN.finditer(text)]


def tokenize(text: str) -> list[str]:
    return [m.group() for m in TOKEN_SPLIT_PATTERN.finditer(text)]


def _mask(text: str) -> str:
    chars = list(text)
    for pat in [URL_PATTERN, *DATE_DOTTED_PATTERNS, SMILEY_PATTERN]:
        for m in pat.finditer(text):
            for i in range(m.start(), m.end()):
                chars[i] = MASK_CHARACTER
    return "".join(chars)


def split_sentences(text: str, language: str = "en") -> list[Token]:
    """Sentence spans (trimmed, offsets into the ORIGINAL text)."""
    masked = _mask(text)
    pattern = SENTENCE_SPLIT_DE if language == "de" else SENTENCE_SPLIT_EN
    out: list[Token] = []

    def emit(start: int, end: int) -> None:
        value = masked[start:end]
        lstripped = value.lstrip()
        left = start + (len(value) - len(lstripped))
        trimmed = lstripped.rstrip()
        if trimmed:
            out.append(Token(left, text[left:left + len(trimmed)]))

    last = 0
    for m in pattern.finditer(masked):
        emit(last, m.end())
        last = m.end()
    if last < len(masked):
        emit(last, len(masked))
    return out


_UNWANTED = set(",.;:!|?¬  #-'\"*/\\@<>=·^_+»•”“´`¯~®™○")


def _clean_trim(s: str, keep: str = "“”\"") -> str:
    """StringHelper.trim(s, keepCharacters) port (StringHelper.java:962)."""
    s = s.strip()
    drop = _UNWANTED - set(keep)
    while s and (s[0] in drop or s[0].isspace()):
        s = s[1:]
    while s and (s[-1] in drop or s[-1].isspace()):
        s = s[:-1]
    return s


def get_sentences(text: str, only_real: bool = True,
                  language: str = "en") -> list[Token]:
    """Tokenizer.getSentences port; keeps offsets for downstream spans."""
    sentences = split_sentences(text, language)
    if not only_real:
        return sentences
    real: list[Token] = []
    for tok in sentences:
        value = tok.value
        nl = value.rfind("\n")
        start = tok.start
        if nl >= 0:  # keep only the last line (headline absorption)
            start += nl + 1
            value = value[nl + 1:]
        if not value.endswith((".", "?", "!", ".”", '."')):
            continue
        clean = _clean_trim(value)
        word_count = value.count(" ") + 1
        if len(clean) > 8 and word_count > 2:
            lstripped = value.lstrip()
            start += len(value) - len(lstripped)
            real.append(Token(start, lstripped.rstrip()))
    return real


# --- n-gram helpers (Preprocessor / CharacterNGramTokenizer semantics,
# /root/reference/palladian-core/src/main/java/ws/palladian/extraction/token/CharacterNGramTokenizer.java:13-80
# and classification/text/Preprocessor.java:38-101) ----------------------


def char_ngrams(text: str, n_min: int, n_max: int,
                padding: bool = False) -> list[str]:
    """Char n-grams in [n_min, n_max]; optional '#' edge padding; grams
    that consist only of padding are skipped."""
    if padding:
        pad = "#" * (n_max - 1)
        text = pad + text + pad
    out: list[str] = []
    for n in range(n_min, n_max + 1):
        for i in range(len(text) - n + 1):
            g = text[i:i + n]
            if padding and (set(g) == {"#"}):
                continue
            out.append(g)
    return out


def word_ngrams(tokens: list[str], n_min: int, n_max: int) -> list[str]:
    out = []
    for n in range(n_min, n_max + 1):
        for i in range(len(tokens) - n + 1):
            out.append(" ".join(tokens[i:i + n]))
    return out


def char_edge_ngrams(string: str, n: int,
                     must_hit_left_edge: bool = False) -> set[str]:
    """Tokenizer.calculateCharEdgeNGrams port (Tokenizer.java:94-120):
    only the n-gram touching the left edge and the one touching the
    right edge of the word are kept ("pROTector" must not yield "rot").
    must_hit_left_edge stops after the prefix gram."""
    out: set[str] = set()
    length = len(string)
    if length < n:
        return out
    for i in range(0, length - n + 1):
        if i > 0 and i != length - n:
            continue
        out.add(string[i:i + n])
        if i == 0 and must_hit_left_edge:
            break
    return out


def all_char_edge_ngrams(string: str, n1: int, n2: int,
                         must_hit_left_edge: bool = False) -> set[str]:
    """Tokenizer.calculateAllCharEdgeNGrams port (Tokenizer.java:65-79):
    split on single spaces, union of per-part edge grams for every n in
    [n1, n2]."""
    out: set[str] = set()
    for part in string.split(" "):
        for n in range(n1, n2 + 1):
            out |= char_edge_ngrams(part, n, must_hit_left_edge)
    return out


def compute_starting_word_ngrams(string: str, n1: int,
                                 n2: int) -> list[str]:
    """Tokenizer.computeStartingWordNGrams port (Tokenizer.java:
    247-265): word n-grams anchored at the START of the string, from
    the longest (min(n2, words)) down, at most n2-n1+1 of them."""
    split = string.split(" ")
    n2 = min(n2, len(split))
    out: list[str] = []
    for i in range(min(len(split), n2 - n1 + 1)):
        ngram = " ".join(split[:n2 - i]).strip()
        if ngram:
            out.append(ngram)
    return out


def compute_splits(string: str, n1: int, n2: int,
                   max_splits: int) -> set[tuple[str, ...]]:
    """Tokenizer.computeSplits port (Tokenizer.java:203-236): every way
    of segmenting the string into starting n-grams of n1..n2 words,
    capped at max_splits results."""
    splits: set[tuple[str, ...]] = set()

    def rec(current: list[str], rest: str) -> None:
        if not rest:
            splits.add(tuple(current))
            if current:
                current.pop()
            return
        if len(splits) >= max_splits:
            return
        for ngram in compute_starting_word_ngrams(rest, n1, n2):
            current.append(ngram)
            nxt = rest[len(ngram):].strip() if rest.startswith(ngram) \
                else rest
            rec(current, nxt)
        if current:
            current.pop()

    rec([], string)
    return splits


def _is_bracket(ch: str) -> bool:
    """StringHelper.isBracket (StringHelper.java:682-684)."""
    return ch in "(){}[]"


def phrase_to_end_of_sentence(string: str) -> str:
    """Tokenizer.getPhraseToEndOfSentence (Tokenizer.java:450-519),
    exact translation: period scan with the numeral / uppercase /
    bracket / preceding-quote context rules (each check OVERWRITES
    the previous verdict, as written), break/end-of-string
    acceptance, an earlier !/? wins, and the delimiter character is
    KEPT (++endIndex)."""
    end_index = string.find(".")
    ok = False
    while not ok and end_index > -1:
        if end_index > 0:
            ok = not string[end_index - 1].isdigit()
        if end_index < len(string) - 1:
            ok = ((not string[end_index + 1].isdigit()
                   and string[end_index + 1].isupper())
                  or _is_bracket(string[end_index + 1])
                  or (end_index > 0 and string[end_index - 1] == '"'))
        if not ok and end_index < len(string) - 2:
            ok = (not string[end_index + 2].isdigit()
                  and (string[end_index + 2].isupper()
                       or _is_bracket(string[end_index + 2]))
                  and string[end_index + 1] == " ")
        if not ok and (len(string) == end_index + 1
                       or string[end_index + 1] == "\n"):
            ok = True
        if ok:
            break
        if end_index < len(string) - 1:
            end_index = string.find(".", end_index + 1)
        else:
            end_index = -1
    bang = string.find("!")
    if bang > -1 and (bang < end_index or end_index == -1):
        end_index = bang
    quest = string.find("?")
    if quest > -1 and (quest < end_index or end_index == -1):
        end_index = quest
    if end_index == -1:
        end_index = len(string)
    else:
        end_index += 1
    return string[:end_index]


def get_sentence(string: str, position: int,
                 language: str = "en") -> str:
    """Tokenizer.getSentence (Tokenizer.java:267-296): the last
    sentence whose indexOf start is <= position."""
    if position < 0:
        return string
    picked = ""
    for tok in get_sentences(string, language=language):
        start = string.find(tok.value)
        if start <= position:
            picked = tok.value
        else:
            break
    return picked


def phrase_from_beginning_of_sentence(string: str) -> str:
    """Tokenizer.getPhraseFromBeginningOfSentence port (:369-438): text
    after the last sentence delimiter, skipping periods inside numbers
    (e.g. "30.2%")."""
    string = regex.sub(r"  +", " ", string)
    start = max(string.rfind("."), string.rfind("\n"))
    ok = False
    while not ok and start > -1:
        if start >= len(string) - 1:
            break
        if start > 0:
            ok = (not string[start - 1].isdigit()
                  and string[start + 1].isupper())
        if not ok and start < len(string) - 2:
            ok = ((string[start + 2].isupper()
                   or string[start + 2] in "-=")
                  and string[start + 1] == " ")
        if not ok and (string[start + 1] == "\n" or string[start] == "\n"):
            ok = True
        if ok:
            break
        start = string[:start].rfind(".") if start < len(string) - 1 \
            else -1
    for ch in "!?:":
        i = string.rfind(ch)
        if i > start:
            start = i
    string = string[start + 1:]
    return string[1:] if string.startswith(" ") else string


def word_ngram_sequence(tokens: list[str], n_min: int,
                        n_max: int) -> list[str]:
    """NGramWrapperIterator order (extraction/token/
    NGramWrapperIterator.java): POSITION-major — every length from one
    start token before advancing ("the", "the quick", "quick", ...),
    unlike word_ngrams' length-major enumeration
    (Tokenizer.calculateWordNgrams)."""
    out = []
    for i in range(len(tokens)):
        for n in range(n_min, n_max + 1):
            if i + n <= len(tokens):
                out.append(" ".join(tokens[i:i + n]))
    return out
