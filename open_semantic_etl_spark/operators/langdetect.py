"""Language identification: stopword-profile heuristic in a pandas UDF.

Replaces the reference's HTTP hop to Tika ``/language/string``
(enhance_detect_language_tika_server.py:59-73) with a deterministic,
pinned, in-process classifier — no service, no model download. The
input is the same analysis-text concat the reference builds
(title + description + content, :32-38).

Method (public n-gram/stopword LangID family): lowercase tokenize,
score each language by the fraction of tokens found in its function-word
list, pick the max above a threshold, else ``und`` (ISO 639-3 for
undetermined — Tika's behavior for unknown). Ties break by fixed
language order, making the operator fully deterministic.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Public function-word lists (most frequent words per language).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """the of and to in a is that it was for on are with as his they at
        be this have from or had by hot word but what some we can out other
        were all there when up use your how said an each she which do their
        if will way about many then them would like these her him into has
        more two could been who its did get may""".split()
    ),
    "de": frozenset(
        """der die und in den von zu das mit sich des auf für ist im dem
        nicht ein eine als auch es an werden aus er hat dass sie nach wird
        bei einer um am sind noch wie einem über einen so zum war haben nur
        oder aber vor zur bis mehr durch man sein wurde sei ihre dann unter
        wir soll ich eines jahr zwei diese dieser wieder keine uns""".split()
    ),
    "fr": frozenset(
        """le de la et les des en un du une que est pour qui dans a par plus
        pas au sur ne se ce il sont la avec son au aux comme mais ou si leur
        y dont elle tout deux meme ces cette fait ete entre nous sans autres
        sa ses on etre aussi bien encore tous peut apres avait votre""".split()
    ),
    "es": frozenset(
        """el de la que y en los del se las por un para con no una su al lo
        como mas pero sus le ya o este si porque esta entre cuando muy sin
        sobre tambien me hasta hay donde quien desde todo nos durante todos
        uno les ni contra otros ese eso ante ellos e esto antes""".split()
    ),
    "it": frozenset(
        """di e il la che in a per un del con non sono da si le dei al una
        nel alla i lo gli delle piu come dal questo ha o se anche ma della
        suo hanno essere sua nella loro tutti questa fra tra ad era""".split()
    ),
    "nl": frozenset(
        """de van het een en in is dat op te zijn met voor niet aan er ook
        als maar om door over bij dan uit nog worden naar heeft werd hij zij
        wordt deze naar hun of tot ze wel geen meer al onder andere""".split()
    ),
}
LANG_ORDER = ("en", "de", "fr", "es", "it", "nl")
MIN_SCORE = 0.05
_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# single-pass scoring: token → per-language hit vector (one dict lookup
# per token instead of one membership test per token per language)
_WORD_LANGS: dict[str, tuple[int, ...]] = {}
for _li, _lang in enumerate(LANG_ORDER):
    for _w in STOPWORDS[_lang]:
        _WORD_LANGS.setdefault(_w, ())
        _WORD_LANGS[_w] = _WORD_LANGS[_w] + (_li,)


#: chars sampled for identification — stopword ratios stabilize within
#: a few hundred tokens (cld2-style prefix sampling); avoids scanning
#: megabyte documents for a 2-letter answer
SAMPLE_CHARS = 4096


def detect_language(text: str | None) -> str:
    if not text:
        return "und"
    if len(text) > SAMPLE_CHARS:
        # cut at a word boundary so the last token isn't a fragment
        cut = text.rfind(" ", 0, SAMPLE_CHARS)
        text = text[: cut if cut > 0 else SAMPLE_CHARS]
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < 3:
        return "und"
    counts = [0] * len(LANG_ORDER)
    get = _WORD_LANGS.get
    for t in toks:
        hit = get(t)
        if hit:
            for li in hit:
                counts[li] += 1
    best_lang, best_score = "und", MIN_SCORE
    n = len(toks)
    for li, lang in enumerate(LANG_ORDER):
        score = counts[li] / n
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


@F.pandas_udf(T.StringType())
def _detect_udf(texts: pd.Series) -> pd.Series:
    return texts.map(detect_language)


def language_expr(text_col: str | Column = "text_analysis") -> Column:
    """language_s column (enhance_detect_language_tika_server.py:73)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _detect_udf(c)
