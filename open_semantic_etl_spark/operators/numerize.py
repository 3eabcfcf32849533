"""English written-number → digits rewriting (numerizer replacement).

The reference calls the public ``numerizer`` package for English text
before money extraction (enhance_extract_money.py:29-32). This is a
small deterministic reimplementation of the classic written-number
grammar: units/tens accumulate, 'hundred' multiplies the current
group, larger scales flush the group into the total.

``numerize_en("two million two hundred and fifty thousand and seven")``
→ ``"2250007"`` (golden from test_enhance_extract_money.py:62-72).
"""

from __future__ import annotations

import re

_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALES = {"hundred": 100, "thousand": 1_000, "million": 1_000_000,
           "billion": 1_000_000_000, "trillion": 1_000_000_000_000}
_NUM_WORDS = set(_UNITS) | set(_TENS) | set(_SCALES)

# token scan + set membership (a 30-alternative regex costs ~O(30·n) in
# Python's backtracking engine; alpha-token finditer + dict lookup is
# O(n)); word-char guards reproduce the \b semantics around digits/_
_ALPHA_RE = re.compile(r"[A-Za-z]+")
_SEP_RE = re.compile(r"(?:[\s-]+(?:and[\s-]+)?)\Z")
_WORDCHARS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _find_number_words(text: str):
    for m in _ALPHA_RE.finditer(text):
        if m.group(0).lower() in _NUM_WORDS:
            s, e = m.start(), m.end()
            if (s == 0 or text[s - 1] not in _WORDCHARS) and (
                e >= len(text) or text[e] not in _WORDCHARS
            ):
                yield m


def _parse(words: list[str]) -> int:
    total, group = 0, 0
    for w in words:
        if w in _UNITS:
            group += _UNITS[w]
        elif w in _TENS:
            group += _TENS[w]
        elif w == "hundred":
            group = (group or 1) * 100
        else:  # larger scale flushes the group
            total += (group or 1) * _SCALES[w]
            group = 0
    return total + group


def numerize_en(text: str | None) -> str | None:
    """Replace each written-number phrase with its integer rendering."""
    if not text:
        return text
    matches = list(_find_number_words(text))
    if not matches:
        return text
    # group adjacent number words separated by whitespace/hyphens/'and'
    groups: list[list[re.Match]] = [[matches[0]]]
    for m in matches[1:]:
        gap = text[groups[-1][-1].end() : m.start()]
        if gap == "" or _SEP_RE.fullmatch(gap):
            groups[-1].append(m)
        else:
            groups.append([m])
    out: list[str] = []
    pos = 0
    for grp in groups:
        start, end = grp[0].start(), grp[-1].end()
        out.append(text[pos:start])
        out.append(str(_parse([m.group(0).lower() for m in grp])))
        pos = end
    out.append(text[pos:])
    return "".join(out)
