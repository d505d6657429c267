"""Charset detection ladder (core/charset.py) + the sniffed WARC
ingestion path (sources/warc.py warc_to_documents_sniffed)."""

from __future__ import annotations

import codecs

from claude_readability_hook_spark.core.charset import (
    decode_payload,
    sniff_charset,
)
from claude_readability_hook_spark.sources.warc import synthesize_warc

CAFE = "un café près du musée"


def test_bom_wins():
    assert sniff_charset(codecs.BOM_UTF8 + b"hi") == "utf-8-sig"
    assert sniff_charset(CAFE.encode("utf-16")) == "utf-16"
    text, enc = decode_payload(codecs.BOM_UTF8 + CAFE.encode("utf-8"))
    assert (text, enc) == (CAFE, "utf-8-sig")


def test_header_charset():
    body = CAFE.encode("cp1252")
    text, enc = decode_payload(body, "text/html; charset=ISO-8859-1")
    # WHATWG: latin-1 labels mean windows-1252
    assert (text, enc) == (CAFE, "cp1252")


def test_meta_charset():
    body = ('<html><meta charset="windows-1252"><body>' + CAFE).encode("cp1252")
    assert sniff_charset(body) == "cp1252"
    assert decode_payload(body)[0].endswith(CAFE)


def test_utf8_trial_then_cp1252_fallback():
    assert decode_payload(CAFE.encode("utf-8")) == (CAFE, "utf-8")
    # undeclared cp1252 bytes are NOT valid utf-8 → fallback
    text, enc = decode_payload(CAFE.encode("cp1252"))
    assert (text, enc) == (CAFE, "cp1252")


def test_lying_header_falls_through():
    # header says utf-16 but the body is utf-8: strict decode of the
    # declared codec fails, the ladder lands on a total codec instead
    # of raising or mangling with replacement chars
    text, enc = decode_payload(b"plain ascii", "text/html; charset=utf-16")
    assert text == "plain ascii" and enc in ("cp1252", "latin-1")


def test_warc_sniffed_ingestion(spark, tmp_path):
    from claude_readability_hook_spark.sources.warc import (
        warc_to_documents_sniffed,
    )

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "u.warc").write_bytes(
        synthesize_warc([("https://x/u", CAFE)])  # utf-8, undeclared
    )
    (seg_dir / "w.warc").write_bytes(
        synthesize_warc(
            [("https://x/w", CAFE)], encoding="cp1252", declare_charset=True
        )
    )
    (seg_dir / "q.warc").write_bytes(
        synthesize_warc([("https://x/q", CAFE)], encoding="cp1252")
    )  # undeclared cp1252 → trial-decode fallback
    out = {
        r["url"]: r
        for r in warc_to_documents_sniffed(spark, str(seg_dir)).collect()
    }
    assert out["https://x/u"]["text"] == CAFE
    assert out["https://x/u"]["charset"] == "utf-8"
    assert out["https://x/w"]["text"] == CAFE
    assert out["https://x/w"]["charset"] == "cp1252"
    assert out["https://x/q"]["text"] == CAFE
    assert out["https://x/q"]["charset"] == "cp1252"


def test_default_synthesize_bytes_unchanged():
    # the encoding/declare_charset params must not perturb the byte
    # stream the warc_ingest oracle was verified against
    a = synthesize_warc([("https://x/a", "hello")])
    assert b"Content-Type: text/html\r\n" in a
    assert b"charset" not in a
