"""Blacklist/whitelist row filtering + per-stage content-type gating.

- ``blacklist_predicate`` reimplements filter_blacklist.py:68-129: a
  document is dropped when its id matches any blacklist (exact /
  prefix / suffix / regex) UNLESS a whitelist matches (whitelist
  overrides). In the reference a hit sets ``parameters['break']``
  (stop-before-export); here it is a row predicate for ``df.filter`` —
  same observable outcome, but Catalyst can push it into the scan.

- ``stage_gate`` reimplements the per-plugin content-type blacklists +
  ``Plugin.filter`` suffix/mimetype gates (etl.py:71-145,
  etl_plugin_core.py:10-82): instead of skipping a plugin per row, the
  stage's output column is computed under ``when(pred, expr)`` —
  conditional column computation, not row filtering, so one pass still
  serves every row class.

All lists are plan-time constants (broadcast via the literal arrays in
the expression), mirroring the reference's config files.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _match_any(
    value: Column,
    exact: tuple[str, ...] = (),
    prefix: tuple[str, ...] = (),
    suffix: tuple[str, ...] = (),
    regex: tuple[str, ...] = (),
) -> Column:
    cond = F.lit(False)
    if exact:
        cond = cond | value.isin(list(exact))
    for p in prefix:
        cond = cond | value.startswith(p)
    for s in suffix:
        cond = cond | value.endswith(s)
    for r in regex:
        cond = cond | (F.regexp_count(value, F.lit(r)) > 0)
    return cond


def blacklist_predicate(
    id_col: Column,
    blacklist: dict[str, tuple[str, ...]] | None = None,
    whitelist: dict[str, tuple[str, ...]] | None = None,
) -> Column:
    """True = KEEP the row. Dict keys: exact/prefix/suffix/regex."""
    blacklist = blacklist or {}
    whitelist = whitelist or {}
    black = _match_any(id_col, **{k: tuple(v) for k, v in blacklist.items()})
    if whitelist:
        white = _match_any(id_col, **{k: tuple(v) for k, v in whitelist.items()})
        return ~black | white
    return ~black


def stage_gate(
    content_type: Column,
    id_col: Column,
    mimetype_prefixes: tuple[str, ...] = (),
    filename_suffixes: tuple[str, ...] = (),
) -> Column:
    """True when a stage applies to this row (Plugin.filter semantics:
    declared mimetype prefixes OR lowercase filename suffixes)."""
    cond = F.lit(False)
    for m in mimetype_prefixes:
        cond = cond | content_type.startswith(m)
    for s in filename_suffixes:
        cond = cond | F.lower(id_col).endswith(s.lower())
    if not mimetype_prefixes and not filename_suffixes:
        return F.lit(True)
    return cond


def gated(pred: Column, expr: Column) -> Column:
    """conditional stage output: compute only where the gate holds
    (etl.py:168-177 skip → null column + etl_<plugin>_blacklisted_b)."""
    return F.when(pred, expr)
