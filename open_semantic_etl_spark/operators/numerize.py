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

_PHRASE_RE = re.compile(
    r"\b(?:(?:" + "|".join(sorted(_NUM_WORDS)) + r")(?:[\s-]+(?:and[\s-]+)?)?)+\b",
    re.IGNORECASE,
)


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

    def repl(m: re.Match) -> str:
        phrase = m.group(0)
        words = [
            w for w in re.split(r"[\s-]+", phrase.lower().strip()) if w in _NUM_WORDS
        ]
        if not words:
            return phrase
        # keep any trailing whitespace the greedy match swallowed
        trailing = phrase[len(phrase.rstrip()):]
        return str(_parse(words)) + trailing

    return _PHRASE_RE.sub(repl, text)
