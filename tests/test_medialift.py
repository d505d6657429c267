"""Media lifting: images inside HTML become media spans in document
order; media inside boilerplate disappears with its subtree."""

from __future__ import annotations

from claude_readability_hook_spark.core.dom import parse_html
from claude_readability_hook_spark.core.extractor import extract_document
from claude_readability_hook_spark.core.medialift import lift_media


def _doc(html):
    return extract_document(
        "m", [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]
    )


def test_images_become_media_spans_in_order():
    html = (
        "<article><p>Before the image, a sentence with enough words, truly.</p>"
        '<img src="https://cdn.example.com/a.jpg" alt="First figure"/>'
        "<p>Between the images, another sentence with enough words, clearly.</p>"
        '<figure><img src="/b.png" alt="Second figure"/></figure>'
        "<p>After the images, a closing sentence with enough words, finally.</p>"
        "</article>"
    )
    r = _doc(html)
    assert r.success
    kinds = [(s["kind"], s["media_ref"]) for s in r.spans]
    assert kinds == [
        ("text", ""),
        ("media", "https://cdn.example.com/a.jpg"),
        ("text", ""),
        ("media", "/b.png"),
        ("text", ""),
    ]
    media = [s for s in r.spans if s["kind"] == "media"]
    assert media[0]["text"] == "First figure"  # alt text carried
    assert [s["offset"] for s in r.spans] == [0, 1, 2, 3, 4]


def test_media_in_boilerplate_dropped():
    html = (
        '<div class="advertisement"><img src="/ad.gif" alt="ad"/></div>'
        "<article><p>Real content paragraph, with commas, long enough to win.</p>"
        '<img src="/keep.jpg" alt="kept"/></article>'
        '<aside class="sidebar"><img src="/side.png"/></aside>'
    )
    r = _doc(html)
    refs = [s["media_ref"] for s in r.spans if s["kind"] == "media"]
    assert refs == ["/keep.jpg"]


def test_video_and_audio_sources():
    root = parse_html(
        '<video poster="/p.jpg"><source src="/v.mp4"/></video>'
        '<audio src="/a.ogg"></audio>'
    )
    items = lift_media(root)
    refs = sorted(i.media_ref for i in items.values())
    # poster wins for video (first matching attr), src for audio
    assert refs == ["/a.ogg", "/p.jpg"]


def test_srcless_media_dropped_silently():
    html = "<article><p>Words enough to extract, with a comma, here.</p><img/></article>"
    r = _doc(html)
    assert all(s["kind"] != "media" for s in r.spans)
    assert r.success


def test_data_src_lazyload():
    root = parse_html('<img data-src="/lazy.jpg" alt="z"/>')
    items = lift_media(root)
    assert list(items.values())[0].media_ref == "/lazy.jpg"
