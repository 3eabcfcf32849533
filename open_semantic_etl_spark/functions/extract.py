"""Regex/token extractors as pure Column expressions (JVM-side, codegen).

Each function reimplements one reference extractor's observable
semantics with built-in ``pyspark.sql.functions`` — no Python in the
hot path (the reference runs these row-at-a-time in CPython over the
``get_text`` concat; here they vectorize over whole columns):

- emails / message-from / message-to / email domains
  (enhance_extract_email.py:22-48)
- phone + digits-only normalization (enhance_extract_phone.py:12-56)
- hashtags (enhance_extract_hashtags.py:12-18)
- money amount⟷currency both orders (enhance_extract_money.py:41-56)
- law clauses with § normalization (enhance_extract_law.py:42-81)
- generic TSV regex rules, e.g. IBAN (enhance_regex.py:8-64,
  etc/opensemanticsearch/regex/iban.tsv)

Multi-value semantics: the reference's ``append`` dedupes via
``list(set(...))`` destroying order (etl.py:296); the typed model's
canonical order is FIRST OCCURRENCE, via ``array_distinct``
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# emails — enhance_extract_email.py:22 regex '[\w\.-]+@[\w\.-]+'
# ---------------------------------------------------------------------------
EMAIL_RE = r"[\w.-]+@[\w.-]+"


def _gate_literal(text: Column, literal: str, expr: Column) -> Column:
    """Run ``expr`` only when ``literal`` occurs in the text.

    A regex that REQUIRES a literal character can never match without
    it, so `contains` (a memchr-speed scan) short-circuits the regex
    NFA for the common no-hit row — at corpus scale most documents
    contain no '@' or '#'. Semantics are provably identical; only the
    plan changes (conditional branch instead of unconditional scan).
    NULL text stays NULL (matching the ungated regexp_extract_all),
    not an empty array.
    """
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))
        .when(text.contains(literal), expr)
        .otherwise(F.array().cast("array<string>"))
    )


def emails(text: Column) -> Column:
    return _gate_literal(
        text, "@", F.array_distinct(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
    )


def email_domains(emails_col: Column) -> Column:
    """domain part of each address (enhance_extract_email.py:43-48)."""
    return F.array_distinct(
        F.transform(emails_col, lambda e: F.element_at(F.split(e, "@"), 2))
    )


def message_from(text: Column) -> Column:
    """sender addresses on 'From: ' lines (group 2 of the reference rule)."""
    return _gate_literal(
        text,
        "@",
        F.array_distinct(
            F.regexp_extract_all(text, F.lit(r"(?i)From: (?:.* )?([\w.-]+@[\w.-]+)"), 1)
        ),
    )


def message_to(text: Column) -> Column:
    return _gate_literal(
        text,
        "@",
        F.array_distinct(
            F.regexp_extract_all(text, F.lit(r"(?i)To: (?:.* )?([\w.-]+@[\w.-]+)"), 1)
        ),
    )


# ---------------------------------------------------------------------------
# phones — enhance_extract_phone.py:12-56
# ---------------------------------------------------------------------------
PHONE_RE = r"[+(]?[1-9][0-9 .\-()]{8,}[0-9]"


def phones(text: Column) -> Column:
    return F.array_distinct(F.regexp_extract_all(text, F.lit(PHONE_RE), 0))


def phones_normalized(phones_col: Column) -> Column:
    """digits only, keep a leading '+' (normalize_phonenumber semantics)."""
    return F.array_distinct(
        F.transform(
            phones_col,
            lambda p: F.concat(
                F.when(p.startswith("+"), F.lit("+")).otherwise(F.lit("")),
                F.regexp_replace(p, r"[^0-9]", ""),
            ),
        )
    )


# ---------------------------------------------------------------------------
# hashtags — enhance_extract_hashtags.py:12-18 (len > 3, startswith '#')
# ---------------------------------------------------------------------------


def hashtags(text: Column) -> Column:
    toks = F.split(text, r"\s+")
    return _gate_literal(
        text, "#", F.filter(toks, lambda w: w.startswith("#") & (F.length(w) > 3))
    )


# ---------------------------------------------------------------------------
# money — enhance_extract_money.py:41-56: number⟷currency in both orders.
# Currency signs are static; gazetteer currency labels can be appended.
# ---------------------------------------------------------------------------
_NUMBER_RE = r"\d+(?:[.,]\d+)*"


def money(text: Column, currency_labels: tuple[str, ...] = ()) -> Column:
    import re as _re

    # longest-first so 'dollars' wins over its prefix 'dollar'
    labels = sorted(currency_labels, key=len, reverse=True)
    cur = "|".join([_re.escape("$"), _re.escape("€")] + [_re.escape(c) for c in labels])
    rule1 = rf"(?i){_NUMBER_RE}\s?(?:{cur})"
    rule2 = rf"(?i)(?:{cur})\s?{_NUMBER_RE}"
    return F.array_distinct(
        F.concat(
            F.regexp_extract_all(text, F.lit(rule1), 0),
            F.regexp_extract_all(text, F.lit(rule2), 0),
        )
    )


# ---------------------------------------------------------------------------
# law clauses — enhance_extract_law.py:42-81
# ---------------------------------------------------------------------------
_CLAUSE_PREFIXES = ["§", "Article", "Artikel", "Art", "Section", "Sec"]
_CLAUSE_SUBSECTIONS = [
    "Abschnitt", "Absatz", "Abs", "Sentence", "Satz", "S",
    "Halbsatz", "Number", "Nummer", "Nr", "Buchstabe",
]
LAW_CLAUSE_RE = (
    "(?i)(" + "|".join(_CLAUSE_PREFIXES) + r")\W*((\d+\W\w(\W|\b))|(\d+\w?))"
    r"(\W?(" + "|".join(_CLAUSE_SUBSECTIONS) + r")\W*(\d+\w?|\w(\W|\b)))*"
)


def _strip(c: Column) -> Column:
    """Python str.strip() (all whitespace) — Spark trim() is spaces-only."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def law_clauses(text: Column) -> Column:
    """matched clauses, stripped, '§123' normalized to '§ 123'."""
    raw = F.regexp_extract_all(text, F.lit(LAW_CLAUSE_RE), 0)
    return F.array_distinct(
        F.transform(
            raw,
            lambda c: F.regexp_replace(_strip(c), r"^§(?=\S)", "§ "),
        )
    )


def law_code_clauses(
    text_flat: Column, clauses_col: Column, code_matchtexts: Column, preflabel: Column
) -> Column:
    """'<clause> <code preflabel>' where clause and matched code text are
    adjacent in the text in either order (enhance_extract_law.py:90-114).

    ``text_flat`` must already have newlines replaced by spaces;
    ``code_matchtexts`` is the gazetteer match-text array for one code.
    Clause normalization applies AFTER the adjacency test, like the
    reference (it tests the raw clause, appends the normalized one).
    """
    raw_clauses = F.regexp_extract_all(text_flat, F.lit(LAW_CLAUSE_RE), 0)
    trimmed = F.transform(raw_clauses, _strip)
    hits = F.filter(
        trimmed,
        lambda cl: F.exists(
            code_matchtexts,
            lambda mt: text_flat.contains(F.concat(cl, F.lit(" "), mt))
            | text_flat.contains(F.concat(mt, F.lit(" "), cl)),
        ),
    )
    return F.array_distinct(
        F.transform(
            hits,
            lambda cl: F.concat(
                F.regexp_replace(cl, r"^§(?=\S)", "§ "), F.lit(" "), preflabel
            ),
        )
    )


# ---------------------------------------------------------------------------
# generic regex rules — enhance_regex.py TSV format: regex \t facet \t group
# ---------------------------------------------------------------------------
IBAN_RULE = (
    r"\b[a-zA-Z]{2}(?: ?)[0-9]{2}(?: ?)[a-zA-Z0-9]{4}(?: ?)[0-9]{7}"
    r"(?: ?)([a-zA-Z0-9]?){0,16}\b"
)


def regex_rule(text: Column, rule: str, group: int = 0, case_insensitive: bool = True) -> Column:
    pat = ("(?i)" if case_insensitive else "") + rule
    return F.array_distinct(F.regexp_extract_all(text, F.lit(pat), group))


def parse_rules_tsv(tsv: str) -> list[tuple[str, str, int]]:
    """Parse the reference's TSV rule format → (regex, facet, group)."""
    rules = []
    for line in tsv.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        cols = line.split("\t")
        regex = cols[0]
        facet = cols[1] if len(cols) > 1 else "tag_ss"
        group = int(cols[2]) if len(cols) > 2 else 0
        rules.append((regex, facet, group))
    return rules


def iban(text: Column) -> Column:
    # gate: the IBAN rule requires 7 consecutive digits — a one-char-
    # class scan short-circuits the full rule on the common no-hit row
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))
        .when(text.rlike(r"[0-9]{7}"), regex_rule(text, IBAN_RULE, 0))
        .otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# PII redaction — composes the extractor patterns above into a
# training-data scrub pass (the C4/RefinedWeb-style PII step; the
# reference only EXTRACTS these fields — enhance_extract_email.py:22,
# enhance_extract_phone.py:12, regex/iban.tsv — redaction is the
# beyond-reference curation tier built on the same single-sourced
# patterns, so extract and redact can never disagree on what is PII)
# ---------------------------------------------------------------------------
PII_EMAIL_TOKEN = "<EMAIL>"
PII_IBAN_TOKEN = "<IBAN>"
PII_PHONE_TOKEN = "<PHONE>"


def redact_pii(text: Column) -> Column:
    """Replace emails, IBANs, and phone numbers with fixed tokens.

    Pure JVM ``regexp_replace`` chain (codegen, no Python). Order is
    part of the contract: emails first (their local parts contain
    digit runs the phone pattern would otherwise chew on), then IBANs
    (whose account-number tail is itself a ≥9-digit run the phone
    pattern matches), then phones — each later pattern sees the
    earlier tokens, which contain no digits and cannot re-match.
    NULL in → NULL out.
    """
    out = F.regexp_replace(text, EMAIL_RE, PII_EMAIL_TOKEN)
    out = F.regexp_replace(out, "(?i)" + IBAN_RULE, PII_IBAN_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PII_PHONE_TOKEN)
    return out
