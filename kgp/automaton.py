"""Aho-Corasick multi-pattern matcher for dictionary tagging.

The reference's DictionaryTagger
(/root/reference/palladian-core/src/main/java/ws/palladian/extraction/DictionaryTagger.java:24-70)
matches every dictionary surface with `(?<!\\w)surface(?!\\w)`
word-boundary semantics, case-insensitively, then removes nested
matches. Scanning once per surface is O(|dictionary| * |text|); a real
seed dictionary (10^5-10^7 surfaces) makes that quadratic-ish. This
automaton finds all occurrences of all surfaces in ONE pass over the
text — O(|text| + matches) regardless of dictionary size — with the
same word-boundary + nested-removal semantics applied afterwards.

Pure Python on purpose: the structure is built once on the driver,
pickled into the pandas-UDF closure, and shared by every Arrow batch on
an executor (no per-call compile, no C extension dependency).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable

import regex

_WORD_CHAR = regex.compile(r"\w")


def _fold(ch: str) -> str:
    """Length-preserving case fold (offsets must survive lowering;
    e.g. 'İ'.lower() is two chars, so keep the original then)."""
    low = ch.lower()
    return low if len(low) == 1 else ch


def _fold_text(text: str) -> str:
    return "".join(_fold(ch) for ch in text)


class AhoCorasick:
    """Aho-Corasick over (surface, tag) pairs — case-insensitive by
    default (DictionaryTagger's Pattern.CASE_INSENSITIVE flag path),
    ``case_sensitive=True`` for the flags==0 path
    (DictionaryTagger.java:44-53).

    Surfaces of length <= 1 are skipped (DictionaryTagger.java:50 loops
    `value.length() > 1` semantics as used by the tagging pipeline).
    A surface may carry only one tag (later additions win, matching
    dict construction order in the callers).
    """

    def __init__(self, surface_tags: Iterable[tuple[str, str]],
                 case_sensitive: bool = False) -> None:
        # state 0 is the root; transitions as per-state char dicts
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[tuple[int, str]]] = [[]]  # (pattern_len, tag)
        self._tag_of: dict[str, str] = {}
        self._case_sensitive = case_sensitive
        fold = (lambda s: s) if case_sensitive else _fold_text
        for surface, tag in surface_tags:
            if len(surface) <= 1:
                continue
            self._add(fold(surface), tag)
        self._fail = self._build_links()

    def _add(self, pattern: str, tag: str) -> None:
        if pattern in self._tag_of:
            # re-tag an existing surface: replace its output entry
            self._tag_of[pattern] = tag
            state = 0
            for ch in pattern:
                state = self._goto[state][ch]
            self._out[state] = [(ln, t) if ln != len(pattern)
                                else (ln, tag) for ln, t in self._out[state]]
            return
        self._tag_of[pattern] = tag
        state = 0
        for ch in pattern:
            nxt = self._goto[state].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto[state][ch] = nxt
                self._goto.append({})
                self._out.append([])
            state = nxt
        self._out[state].append((len(pattern), tag))

    def _build_links(self) -> list[int]:
        fail = [0] * len(self._goto)
        queue: deque[int] = deque(self._goto[0].values())
        while queue:
            state = queue.popleft()
            for ch, nxt in self._goto[state].items():
                queue.append(nxt)
                f = fail[state]
                while f and ch not in self._goto[f]:
                    f = fail[f]
                fail[nxt] = self._goto[f].get(ch, 0)
                if fail[nxt] == nxt:
                    fail[nxt] = 0
                # merge suffix outputs so every state reports all
                # patterns ending at it (standard output-link collapse)
                self._out[nxt] = self._out[nxt] + self._out[fail[nxt]]
        return fail

    def __len__(self) -> int:
        return len(self._tag_of)

    def find_all(self, text: str) -> list[tuple[int, int, str]]:
        """All word-bounded occurrences as (start, end, tag), in text
        order. Equivalent to running `(?<!\\w)s(?!\\w)` per surface
        (with IGNORECASE unless case_sensitive) and concatenating —
        but one pass."""
        folded = text if self._case_sensitive else _fold_text(text)
        goto, fail, out = self._goto, self._fail, self._out
        n = len(folded)
        state = 0
        found: list[tuple[int, int, str]] = []
        for i, ch in enumerate(folded):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                nxt_is_word = i + 1 < n and _WORD_CHAR.match(folded[i + 1])
                if not nxt_is_word:
                    for length, tag in out[state]:
                        start = i + 1 - length
                        if start > 0 and _WORD_CHAR.match(folded[start - 1]):
                            continue
                        found.append((start, i + 1, tag))
        found.sort(key=lambda f: (f[0], -f[1]))
        return found
