"""Charset detection + decoding for crawled payload bytes — real
crawls are not all UTF-8, and `decode('utf-8', errors='replace')`
turns every cp1252 page into U+FFFD mojibake that poisons n-gram
stats, dedup shingles and LM scores downstream.

Detection ladder (first hit wins), the practical subset of the WHATWG
encoding sniff every production crawler implements:

  1. byte-order mark: UTF-8 / UTF-16 LE / UTF-16 BE;
  2. `charset=` parameter in the HTTP Content-Type header (when the
     caller has one);
  3. `<meta charset=...>` / `<meta http-equiv=... content="...
     charset=...">` inside the first SNIFF_BYTES of the body (ASCII
     scan — safe for every ASCII-compatible encoding);
  4. strict UTF-8 trial decode;
  5. cp1252 fallback (the de-facto meaning of declared-or-implied
     latin-1 on the web), with latin-1 as the never-fails last rung
     (every byte maps).

Pure Python over bytes — runs inside the Arrow-batch WARC parser
(sources/warc.py), never per-row through the JVM. Reference
counterpart: none (apps/gateway ships the body to a Node fetch that
trusts the transport); this is the batch-engine hardening for raw
crawl segments.
"""

from __future__ import annotations

import codecs
import re

SNIFF_BYTES = 1024

# encodings we'll honor from headers/meta tags, normalized; anything
# else falls through to the trial-decode ladder (an unknown label must
# not crash a 10^12-document scan)
_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "utf-8",  # ASCII is a UTF-8 subset; strict utf-8 validates it
    "us-ascii": "utf-8",
    "iso-8859-1": "cp1252",  # WHATWG: latin-1 labels mean windows-1252
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.I)
_META_RE = re.compile(rb"<meta[^>]{0,200}>", re.I)


def _normalize(label: bytes | str | None) -> str | None:
    if not label:
        return None
    if isinstance(label, bytes):
        label = label.decode("latin-1", "replace")
    return _ALIASES.get(label.strip().lower())


def sniff_charset(body: bytes, content_type: str | None = None) -> str:
    """The detection ladder; returns a Python codec name."""
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16"  # codec consumes the BOM
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    if content_type:
        m = _CHARSET_RE.search(content_type.encode("latin-1", "replace"))
        enc = _normalize(m.group(1)) if m else None
        if enc:
            return enc
    head = body[:SNIFF_BYTES]
    for tag in _META_RE.findall(head):
        m = _CHARSET_RE.search(tag)
        enc = _normalize(m.group(1)) if m else None
        if enc:
            return enc
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_payload(
    body: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """(text, charset_used). Never raises: the declared/sniffed codec
    is tried strictly first (a LYING header falls through rather than
    replace-mangling the page), then cp1252, then latin-1 (total)."""
    enc = sniff_charset(body, content_type)
    for attempt in (enc, "cp1252", "latin-1"):
        try:
            return body.decode(attempt), attempt
        except (UnicodeDecodeError, LookupError):
            continue
    return body.decode("latin-1", "replace"), "latin-1"
