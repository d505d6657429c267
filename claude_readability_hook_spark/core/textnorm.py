"""Token-thrift text normalization.

Whitespace collapse + entity decoding semantics matching the reference:
  - final cleanup `\\n{3,}` → `\\n\\n` then trim
    (reference: code-block-preserver.ts:66-67)
  - entity decode (reference decodes via TextDecoder/jsdom; here
    html.unescape for any text that did not pass through the DOM parser)
"""

from __future__ import annotations

import html as _html
import re

_MULTI_BLANK = re.compile(r"\n{3,}")
_INLINE_WS = re.compile(r"[ \t\f\v ]+")
_WS_AROUND_NL = re.compile(r"[ \t]*\n[ \t]*")


def collapse_blank_lines(text: str) -> str:
    """`\\n{3,}` → `\\n\\n` + trim — the reference's final normalize
    (code-block-preserver.ts:66-67)."""
    return _MULTI_BLANK.sub("\n\n", text).strip()


def normalize_inline_ws(text: str) -> str:
    """Collapse runs of spaces/tabs/nbsp to a single space and strip
    space around newlines. Newlines themselves are preserved (paragraph
    structure is meaningful downstream)."""
    text = _INLINE_WS.sub(" ", text)
    text = _WS_AROUND_NL.sub("\n", text)
    return text


def normalize_text(text: str) -> str:
    """Full token-thrift normalization for extracted prose."""
    return collapse_blank_lines(normalize_inline_ws(text))


def unescape_entities(text: str) -> str:
    return _html.unescape(text)
