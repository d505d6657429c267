"""Property-based differential fuzzing of the fast scanner against the
html.parser reference builder: arbitrary tag soup must produce the same
extraction-relevant tree, and must never raise."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from claude_readability_hook_spark.core.dom import Node, parse_html_stdlib
from claude_readability_hook_spark.core.fastparse import fast_parse_html

_tags = st.sampled_from(
    ["div", "p", "span", "a", "pre", "code", "ul", "li", "article", "img", "br",
     "script", "style", "b", "h1", "table", "td", "noscript"]
)
_text = st.text(
    alphabet=st.characters(blacklist_characters="<>&", max_codepoint=0x2FF),
    max_size=30,
)
_attr = st.sampled_from(
    ["", ' class="x y"', " id='z'", ' data-lang="py"', " checked", ' class="nav"']
)


@st.composite
def soup(draw, depth=0):
    n = draw(st.integers(0, 4))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 5))
        if kind <= 1 or depth > 3:
            parts.append(draw(_text))
        elif kind == 2:  # well-formed element
            tag = draw(_tags)
            attr = draw(_attr)
            inner = draw(soup(depth=depth + 1))
            parts.append(f"<{tag}{attr}>{inner}</{tag}>")
        elif kind == 3:  # unclosed start tag
            parts.append(f"<{draw(_tags)}{draw(_attr)}>{draw(_text)}")
        elif kind == 4:  # stray end tag
            parts.append(f"</{draw(_tags)}>")
        else:  # comment / entity / doctype noise
            parts.append(
                draw(st.sampled_from(
                    ["<!-- c -->", "&amp;", "&lt;x&gt;", "<!DOCTYPE html>", "&#65;"]
                ))
            )
    return "".join(parts)


def _shape(node: Node) -> object:
    if node.tag is None:
        return ("#text", node.text)
    if node.tag in ("script", "style"):
        # stdlib html.parser DROPS unterminated rawtext content at EOF
        # (buffered CDATA never flushes); the fast scanner keeps it,
        # which is the browser behavior. Both strip these tags before
        # extraction, so compare them contentless.
        return (node.tag, "", "", [])
    return (
        node.tag,
        node.attrs.get("class", ""),
        node.attrs.get("id", ""),
        [_shape(c) for c in node.children],
    )


@settings(max_examples=150, deadline=None)
@given(soup())
def test_fuzz_tree_matches_stdlib(html):
    assert _shape(fast_parse_html(html)) == _shape(parse_html_stdlib(html))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_fuzz_arbitrary_input_never_raises(html):
    root = fast_parse_html(html)
    assert root.tag == "#root"
    root.text_content()  # walkable
