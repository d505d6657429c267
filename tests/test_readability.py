"""Readability-core contracts: boilerplate strip, candidate selection,
precision-vs-recall behavior, title precedence."""

from claude_readability_hook_spark.core.readability import (
    PRECISION,
    RECALL,
    extract_main_content,
)

ARTICLE = (
    "<html><head><title>Page Title</title></head><body>"
    '<nav class="nav-menu"><a href="/">Home</a><a href="/a">About</a></nav>'
    '<div class="advertisement"><a href="#">Buy now limited offer click here</a></div>'
    '<article class="post"><h1>Real Headline</h1>'
    "<p>First paragraph of genuine article content, long enough to matter, with commas.</p>"
    "<p>Second paragraph, also substantive, carrying the main argument of the piece.</p>"
    "</article>"
    '<aside class="sidebar"><ul><li><a href="/x">Related one</a></li></ul></aside>'
    '<footer class="site-footer"><p>Copyright 2025 Example Corp. All rights reserved.</p></footer>'
    "</body></html>"
)


def test_boilerplate_stripped():
    r = extract_main_content(ARTICLE, PRECISION)
    assert r.success
    assert "First paragraph" in r.text
    assert "Second paragraph" in r.text
    assert "Home" not in r.text
    assert "Buy now" not in r.text
    assert "Related one" not in r.text
    assert "Copyright" not in r.text


def test_title_precedence_title_tag():
    r = extract_main_content(ARTICLE, PRECISION)
    assert r.title == "Page Title"


def test_title_precedence_og_first():
    html = (
        '<html><head><meta property="og:title" content="OG Title"/>'
        "<title>Tab Title</title></head><body><article><p>"
        + "content words here, plenty of them to extract. " * 3
        + "</p></article></body></html>"
    )
    assert extract_main_content(html, PRECISION).title == "OG Title"


def test_title_h1_fallback():
    html = (
        "<html><body><article><h1>H1 Title</h1><p>"
        + "content words here, plenty of them to extract. " * 3
        + "</p></article></body></html>"
    )
    assert extract_main_content(html, PRECISION).title == "H1 Title"


def test_empty_html_fails():
    r = extract_main_content("   \n ", PRECISION)
    assert not r.success


def test_recall_keeps_more_than_precision():
    html = (
        "<html><body><div><p>Main content paragraph, quite long and commaful, stays.</p>"
        "<ul><li>short item</li><li>other item</li></ul>"
        "<p>tiny</p></div></body></html>"
    )
    p = extract_main_content(html, PRECISION)
    r = extract_main_content(html, RECALL)
    assert len(r.text) >= len(p.text)


def test_precision_drops_link_farms():
    html = (
        "<html><body><div>"
        "<p>Genuine long paragraph with enough words, commas, and substance to win.</p>"
        '<p><a href="/1">link</a> <a href="/2">link</a> <a href="/3">link</a></p>'
        "</div></body></html>"
    )
    p = extract_main_content(html, PRECISION)
    assert p.success
    assert "Genuine" in p.text


def test_positive_class_rescues_negative_match():
    # class="article-footer-content" matches both; positive wins
    html = (
        '<html><body><div class="article-content footer">'
        "<p>Body text that is long enough, with a comma, to be extracted.</p>"
        "</div></body></html>"
    )
    r = extract_main_content(html, RECALL)
    assert r.success
    assert "Body text" in r.text


def test_tag_soup_tolerated():
    html = "<html><body><article><p>Unclosed paragraph content, with enough words to keep going"
    r = extract_main_content(html, RECALL)
    assert r.success
    assert "Unclosed paragraph" in r.text
