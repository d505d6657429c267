"""SSR detector matrix (reference:
tests/unit/features/extract/ssr-detector.test.ts:5-172)."""

from claude_readability_hook_spark.core.ssr import (
    extract_signals,
    has_article_content,
    needs_ssr,
    ssr_score,
)


def test_spa_markers_detected():
    html = (
        '<html><body><div id="__next" data-reactroot=""></div>'
        '<script id="__NEXT_DATA__" type="application/json">{}</script>'
        "<script>hydrate()</script></body></html>"
    )
    assert needs_ssr(html)


def test_article_short_circuit():
    html = "<html><body><article><p>" + "content " * 200 + "</p></article></body></html>"
    assert not needs_ssr(html)


def test_amp_page_not_ssr():
    # ssr-detector.test.ts:166-170: AMP pages with content skip SSR
    html = (
        '<html amp><body><div class="content"><h1>Title</h1><p>'
        + "words " * 100
        + "</p></div></body></html>"
    )
    assert not needs_ssr(html)


def test_false_positive_guards():
    # 'my-next-step' / 'angular momentum' must not trip framework markers
    html = (
        '<html><body><article><p class="my-next-step">angular momentum is '
        + "a topic in physics " * 50
        + "</p></article></body></html>"
    )
    assert not needs_ssr(html)


def test_noscript_signal():
    paras = "".join("<p>Content line</p>" for _ in range(100))
    html = f"<html><body><noscript>{paras}</noscript><script>x()</script></body></html>"
    signals = extract_signals(html)
    assert signals.has_noscript_content


def test_data_scripts_excluded_from_ratio():
    ld = '<script type="application/ld+json">{}</script>' * 20
    html = f"<html><body>{ld}<article><p>{'w ' * 3000}</p></article></body></html>"
    signals = extract_signals(html)
    assert signals.script_ratio == 0.0


def test_score_weights_sum():
    html = (
        '<div id="root"></div><script>a</script><script>b</script>'
        "<noscript>" + "text " * 20 + "</noscript>"
    )
    s = extract_signals(html)
    # small (3.0) + script ratio (2.0) + spa (2.5) + noscript (2.0)
    assert ssr_score(s) == 9.5


def test_has_article_content_variants():
    assert has_article_content("<article>")
    assert has_article_content("<main class='x'>")
    assert has_article_content('<div class="post-content">')
    assert not has_article_content("<div class='sidebar'>")
