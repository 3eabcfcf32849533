"""Configured tag-path extraction over HTML/XHTML (enhance_html).

Reimplements enhance_html.py:10-38, 62-82: for each configured element
query, emit a field per tag path — ``<tag>_ss`` holding the matched
element's DIRECT text (lxml ``.text`` semantics: text before the first
child, stripped, empty dropped), and in recursive mode one field per
descendant path (``div/span_ss``) holding each descendant's own direct
text. The reference runs only for ``application/xhtml+xml`` documents
(enhance_html.py:62) — express that with functions/filters.stage_gate.

Supported query form: ``//tag`` (all elements with that tag) — the
form the reference's configs use. The DOM is a minimal stdlib tree
(no lxml dependency); the whole pass is one Arrow-batched pandas UDF
producing ``map<string, array<string>>`` so the dynamic field names of
the reference's dict model stay typed in Spark.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOID = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "text_parts", "children", "seen_child")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.text_parts: list[str] = []
        self.children: list[_Node] = []
        self.seen_child = False

    @property
    def text(self) -> str:
        return "".join(self.text_parts)


class _TreeParser(HTMLParser):
    """bytes → minimal element tree with lxml-style direct text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("")
        self._stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(tag)
        parent = self._stack[-1]
        parent.children.append(node)
        parent.seen_child = True
        if tag not in _VOID:
            self._stack.append(node)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        node = self._stack[-1]
        if not node.seen_child:  # lxml .text = text before first child
            node.text_parts.append(data)


def _iter_nodes(node: _Node):
    yield node
    for c in node.children:
        yield from _iter_nodes(c)


def _emit(node: _Node, path: str, out: dict[str, list[str]], recursive: bool) -> None:
    """elements2data (enhance_html.py:10-38): strip direct text, skip
    empty, append under <path>_ss; recurse with path chaining."""
    path = f"{path}/{node.tag}" if path else node.tag
    text = node.text.strip()
    if text:
        out.setdefault(path + "_ss", []).append(text)
    if recursive:
        for c in node.children:
            _emit(c, path, out, True)


def extract_tag_paths(
    data: bytes | None,
    tags: tuple[str, ...] = (),
    tags_and_children: tuple[str, ...] = (),
) -> dict[str, list[str]]:
    if not data:
        return {}
    from open_semantic_etl_spark.operators.htmlx import decode_html

    text, _ = decode_html(data)
    parser = _TreeParser()
    try:
        parser.feed(text)
        parser.close()
    except Exception:  # noqa: BLE001 — malformed markup → best effort
        pass
    out: dict[str, list[str]] = {}
    wanted = {q.lstrip("/"): False for q in tags}
    wanted.update({q.lstrip("/"): True for q in tags_and_children})
    for node in _iter_nodes(parser.root):
        rec = wanted.get(node.tag)
        if rec is not None:
            _emit(node, "", out, rec)
    return out


PATHS_TYPE = T.MapType(T.StringType(), T.ArrayType(T.StringType()))


def tag_paths_expr(
    html_col: str,
    tags: tuple[str, ...] = (),
    tags_and_children: tuple[str, ...] = (),
) -> Column:
    def run(series: pd.Series) -> pd.Series:
        return series.map(lambda b: extract_tag_paths(b, tags, tags_and_children))

    return F.pandas_udf(run, PATHS_TYPE)(F.col(html_col))


def with_html_paths(
    df: DataFrame,
    tags: tuple[str, ...] = (),
    tags_and_children: tuple[str, ...] = (),
    html_col: str = "html",
    out: str = "html_paths",
) -> DataFrame:
    return df.withColumn(out, tag_paths_expr(html_col, tags, tags_and_children))
