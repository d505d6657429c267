"""Differential tests: the fast regex scanner must build the same tree
(same extraction-relevant view) as the html.parser reference builder,
and extraction output must be identical across both parsers."""

from __future__ import annotations

import pytest

from claude_readability_hook_spark.core.dom import Node, parse_html_stdlib
from claude_readability_hook_spark.core.fastparse import fast_parse_html, parse_attrs
from claude_readability_hook_spark.sources.corpus import (
    FIXTURE_CODE_HTML,
    FIXTURE_SIMPLE_HTML,
    FIXTURE_SPA_HTML,
    build_html_doc,
)

CASES = [
    FIXTURE_SIMPLE_HTML,
    FIXTURE_CODE_HTML,
    FIXTURE_SPA_HTML,
    "<p>a<p>b<p>c",  # implicit closing
    "<ul><li>one<li>two</ul>",
    "<div><img src='x'><br>text</div>",  # void elements
    "<pre><code class=\"language-py\">if a &amp;&amp; b:</code></pre>",
    "<p>5 &lt; 6 &amp; 7 &gt; 2</p>",  # entities in text
    "<script>var a = '<p>not a tag</p>';</script><p>real</p>",
    "<style>p { color: red; }</style><p>styled</p>",
    "<!-- comment --><p>after comment</p>",
    "<!DOCTYPE html><html><body><p>doc</p></body></html>",
    "<div class='a' id=b data-x=\"1\"><span>mixed quotes</span></div>",
    "<p>unclosed <b>bold",
    "</div><p>stray end tag</p>",
    "<td>cell<td>next",
    "<P>UPPER <B>case</B> TAGS</P>",
    "<div a b=2 c='3'>bare attr</div>",
    "<p>text with <br/> self-close</p>",
    "",
    "   \n\t  ",
]


def _shape(node: Node) -> object:
    """Extraction-relevant view: tag, class/id, text content, children."""
    if node.tag is None:
        return ("#text", node.text)
    return (
        node.tag,
        node.attrs.get("class", ""),
        node.attrs.get("id", ""),
        [_shape(c) for c in node.children],
    )


@pytest.mark.parametrize("html", CASES, ids=range(len(CASES)))
def test_tree_shape_matches_stdlib(html):
    fast = fast_parse_html(html)
    ref = parse_html_stdlib(html)
    assert _shape(fast) == _shape(ref)


def test_extraction_identical_on_corpus_docs():
    from claude_readability_hook_spark.core import dom
    from claude_readability_hook_spark.core.extractor import extract_document

    import duckdb

    rows = duckdb.connect().execute(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 200"
    ).fetchall()

    for doc_id, text in rows:
        spans = build_html_doc(int(doc_id), text or "")
        fast_result = extract_document(str(doc_id), spans)

        real_fast = dom.parse_html
        try:
            dom.parse_html = parse_html_stdlib  # type: ignore[assignment]
            # extractor imports parse_html at module level — patch there too
            from claude_readability_hook_spark.core import extractor as ext

            real_ext = ext.parse_html
            ext.parse_html = parse_html_stdlib  # type: ignore[assignment]
            try:
                ref_result = extract_document(str(doc_id), spans)
            finally:
                ext.parse_html = real_ext
        finally:
            dom.parse_html = real_fast

        assert fast_result.spans == ref_result.spans, doc_id
        assert fast_result.title == ref_result.title
        assert fast_result.score == ref_result.score


def test_lazy_attrs_decode():
    attrs = parse_attrs("class=\"a b\" id='x' data-lang=py checked")
    assert attrs == {"class": "a b", "id": "x", "data-lang": "py", "checked": ""}
    assert parse_attrs("title=\"5 &lt; 6\"")["title"] == "5 < 6"
