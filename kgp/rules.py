"""AnnotationRuleEngine port — rule-file-driven candidate fix-up.

Semantics re-derived from
/root/reference/palladian-core/src/main/java/ws/palladian/extraction/location/AnnotationRuleEngine.java:39-215:
each line of the rule file is `condition<TAB>ACTION[<TAB>outcome]`;
the condition is an entity pattern (|...|), a regex entity pattern
(|{{...}}|), a prefix rule (`within|` — matches the RIGHT context) or
a suffix rule (`|flows through` — matches the LEFT context). Actions:
REMOVE_THIS, REMOVE_FRAGMENTS, CLASSIFY_THIS, CLASSIFY_VALUE,
CLASSIFY_FRAGMENTS. Every original annotation triggers every rule in
file order; removals and classifications accumulate in an insertion-
ordered probability map.

Pure Python over StringTagger candidates (used by the location
candidate extractor next to kgp.entity_preprocess).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import NamedTuple

from kgp.mentions import (Candidate, get_left_contexts,
                          get_right_contexts)


class RuleAnnotation(NamedTuple):
    start: int
    value: str
    tag: str | None        # most likely category, None when unscored

    @property
    def end(self) -> int:
        return self.start + len(self.value)


def contains_word(words, text: str) -> bool:
    """StringHelper.containsWord port (StringHelper.java:351-519):
    case-insensitive whole-word containment of ANY of `words`."""
    for word in words:
        if not word:
            continue
        if re.search(r"(?<![0-9A-Za-z])" + re.escape(word)
                     + r"(?![0-9A-Za-z])", text, re.IGNORECASE):
            return True
    return False


class Rule(NamedTuple):
    """Declarative (picklable — rules travel in Spark broadcasts):
    kind ∈ entity | right_context | left_context."""
    kind: str
    pattern: "re.Pattern"
    context_size: int
    action: str
    outcome: str | None

    def matches(self, text: str, a: Candidate) -> bool:
        if self.kind == "entity":
            return bool(self.pattern.fullmatch(a.value))
        if self.kind == "right_context":
            ctx = get_right_contexts(text, a.start + len(a.value),
                                     self.context_size)
        else:
            ctx = get_left_contexts(text, a.start, self.context_size)
        return bool(ctx) and bool(self.pattern.fullmatch(ctx[-1]))


def parse_rule(line: str, line_number: int) -> Rule:
    split = line.split("\t")
    if len(split) not in (2, 3):
        raise ValueError(f"Could not parse {line!r} in line "
                         f"{line_number}.")
    condition, action = split[0], split[1]
    outcome = split[2] if len(split) == 3 else None
    if condition.startswith("|{{") and condition.endswith("}}|"):
        return Rule("entity", re.compile(condition[3:-3]), 0, action,
                    outcome)
    pattern_string = condition.replace("|", "").strip() \
        .replace(".", r"\.").replace("*", ".*")
    pattern = re.compile(pattern_string, re.IGNORECASE)
    context_size = len(pattern_string.split(" "))
    if condition.startswith("|") and condition.endswith("|"):
        return Rule("entity", pattern, 0, action, outcome)
    if condition.startswith("|"):
        # prefix rule: the entity is a prefix → match the RIGHT context
        return Rule("right_context", pattern, context_size, action,
                    outcome)
    if condition.endswith("|"):
        return Rule("left_context", pattern, context_size, action,
                    outcome)
    raise ValueError(f"Could not parse {line!r} in line {line_number}.")


def parse_rules(lines) -> list[Rule]:
    rules = []
    for i, raw in enumerate(lines, 1):
        line = raw.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        rules.append(parse_rule(line, i))
    return rules


def apply_rules(rules: list[Rule], text: str,
                annotations: list[Candidate]) -> list[RuleAnnotation]:
    """AnnotationRuleEngine.apply port (:200-215). Removed annotations
    can still trigger later rules (the outer loop is over the ORIGINAL
    list); classify actions on removed annotations are no-ops."""
    probs: dict[tuple[int, str], Counter] = {
        (a.start, a.value): Counter() for a in annotations}

    def key(a):
        return (a.start, a.value)

    for a in annotations:
        for rule in rules:
            if not rule.matches(text, a):
                continue
            if rule.action == "REMOVE_THIS":
                probs.pop(key(a), None)
            elif rule.action == "REMOVE_FRAGMENTS":
                parts = set(a.value.split(" "))
                for k in [k for k in probs
                          if contains_word(parts, k[1])]:
                    probs.pop(k)
            elif rule.action == "CLASSIFY_THIS":
                if key(a) in probs:
                    probs[key(a)][rule.outcome] += 1
            elif rule.action == "CLASSIFY_VALUE":
                for k in probs:
                    if k[1].lower() == a.value.lower():
                        probs[k][rule.outcome] += 1
            elif rule.action == "CLASSIFY_FRAGMENTS":
                parts = set(a.value.split(" "))
                for k in probs:
                    if contains_word(parts, k[1]):
                        probs[k][rule.outcome] += 1
            else:
                raise ValueError(f"unknown action {rule.action}")
    out = []
    for (start, value), counter in probs.items():
        tag = counter.most_common(1)[0][0] if counter else None
        out.append(RuleAnnotation(start, value, tag))
    return out


# ----------------------------------------------------- address tagging
# AddressTagger port
# (/root/reference/palladian-core/src/main/java/ws/palladian/extraction/location/AddressTagger.java:25-113)

_STREET_PATTERN = re.compile(
    r"[A-Za-z]+(?:\s[A-Za-z]+)?(?:\sstreet$|\sroad$|\savenue$|\save\."
    r"|boulevard$|straße$|strasse$|gasse$|straat|\sdrive|\sst\."
    r"|\strafficway)|"
    r"(?:^rue\s.+|via\s.+|viale\s.+)[A-Za-z]+(?:\s[A-Za-z]+)?",
    re.IGNORECASE)


def tag_addresses(text: str) -> list[RuleAnnotation]:
    """Street names (STREET) from string-tagger candidates of at most
    four tokens matching the suffix/prefix street pattern, plus their
    neighboring street numbers (STREETNR), sorted by offset."""
    from kgp.mentions import candidate_annotations
    out: list[RuleAnnotation] = []
    for a in candidate_annotations(text):
        value = a.value
        if len(value.split(" ")) > 4:
            continue
        end = a.start + len(value)
        # "Bla St" whose '.' the string tagger swallowed
        if value.endswith(" St") and end < len(text) \
                and text[end] == ".":
            value += "."
        if _STREET_PATTERN.fullmatch(value):
            out.append(RuleAnnotation(a.start, value, "STREET"))
    numbers: list[RuleAnnotation] = []
    for street in out:
        quoted = re.escape(street.value)
        for m in re.finditer(quoted + r"\s(\d+)", text):
            numbers.append(RuleAnnotation(m.start(1), m.group(1),
                                          "STREETNR"))
        for m in re.finditer(r"(\d+)\s" + quoted, text):
            numbers.append(RuleAnnotation(m.start(1), m.group(1),
                                          "STREETNR"))
    out.extend(numbers)
    out.sort(key=lambda r: (r.start, -len(r.value)))
    return out
