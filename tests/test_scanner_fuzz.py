"""Property test: the fast regex scanner is observably identical to
html.parser on generated tag soup (the byte-exact contract's guard).

Known, documented divergences excluded by construction (all
adversarial-only, absent from real markup; explicit stray-'<' and
truncated-tag fixtures live in test_html_extract):
- a literal "href=" inside ANOTHER attribute's quoted value of <a>;
- unpaired quote characters inside a tag's attribute region (CPython
  honors quotes only in value position; the scanner quotes anywhere);
so free text here carries entities and quotes but not raw '<'.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from open_semantic_etl_spark.operators import htmlx as H

TAGS = ["p", "div", "span", "li", "ul", "b", "td", "h2", "nav", "aside", "a", "em"]
VOID = ["br", "hr", "img"]

text_chunk = st.text(
    alphabet="abcdefgh &>\"'x;#@ยü\n\t.",
    min_size=0,
    max_size=40,
)
# '>' inside quoted values is legal and must not end the tag; '"' is
# excluded (unpaired quotes are the one documented scanner divergence)
attr_val = st.text(alphabet="abc/123._->< ", min_size=0, max_size=12)


@st.composite
def node(draw, depth=0):
    kind = draw(st.integers(0, 9))
    if kind <= 3 or depth >= 3:
        return draw(text_chunk)
    if kind == 4:
        return f"<!-- {draw(text_chunk)} -->"
    if kind == 5:
        return f"<{draw(st.sampled_from(VOID))}>"
    if kind == 6:
        return f"<script>var x = '{draw(attr_val)}<p>';</script>"
    tag = draw(st.sampled_from(TAGS))
    attrs = ""
    if tag == "a" and draw(st.booleans()):
        attrs = f' href="/{draw(attr_val)}"'
    elif draw(st.booleans()):
        attrs = f' class="{draw(attr_val)}"'
    children = draw(st.lists(node(depth=depth + 1), min_size=0, max_size=4))
    close = f"</{tag}>" if draw(st.integers(0, 4)) else ""  # 20% unclosed
    return f"<{tag}{attrs}>{''.join(children)}{close}"


@st.composite
def page(draw):
    head = ""
    if draw(st.booleans()):
        head = f"<head><title>{draw(text_chunk)}</title></head>"
    body = "".join(draw(st.lists(node(), min_size=1, max_size=8)))
    return f"<html>{head}<body>{body}</body></html>"


@settings(max_examples=300, deadline=None)
@given(page())
def test_fast_scanner_equals_htmlparser_fuzz(doc):
    slow = H._ContentParser()
    slow.feed(doc)
    slow.close()
    fast = H._ContentParser()
    H._fast_feed(fast, doc)
    fast.close()
    assert (slow.blocks, slow.title, slow.description, slow.headings,
            slow.links, slow.meta_ts, slow.n_images) == (
           fast.blocks, fast.title, fast.description, fast.headings,
           fast.links, fast.meta_ts, fast.n_images), doc[:200]
