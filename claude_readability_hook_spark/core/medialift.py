"""Media lifting: <img>/<video>/<audio> inside HTML → media spans.

The span model carries media as first-class spans; pages, however,
embed media inside the DOM. Mirroring the code-block preserver
(codeblocks.py), media elements are replaced with ``__MEDIA_<n>__``
placeholder text nodes before extraction; media inside boilerplate
disappears with its subtree, media inside the winning content subtree
survives in document order and re-emerges as a ``kind='media'`` span
carrying ``media_ref`` (the src) and the alt text.

This is the generalization the reference's placeholder dance implies
(SURVEY §1.1: "the document as an ordered sequence of segments").
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .dom import Node

MEDIA_TAGS = ("img", "video", "audio")

_SRC_ATTRS = ("src", "data-src", "data-original", "poster")


@dataclass
class MediaItem:
    id: str
    media_ref: str
    alt: str
    tag: str


def _src_of(node: Node) -> Optional[str]:
    for attr in _SRC_ATTRS:
        v = node.attrs.get(attr)
        if v:
            return v
    srcset = node.attrs.get("srcset", "")
    if srcset:
        return srcset.split(",")[0].strip().split(" ")[0]
    # <video><source src=...>
    for source in node.iter_elements("source"):
        v = source.attrs.get("src")
        if v:
            return v
    return None


def lift_media(root: Node, start: int = 0) -> dict[str, MediaItem]:
    """Replace media elements with placeholder text nodes (in-place);
    ids continue the per-document counter like lift_code_blocks."""
    items: dict[str, MediaItem] = {}
    counter = start
    for node in list(root.iter_elements(*MEDIA_TAGS)):
        if node.parent is None:
            continue
        src = _src_of(node)
        if not src:
            node.detach()  # decorative/broken media: drop like boilerplate
            continue
        placeholder = f"__MEDIA_{counter}__"
        counter += 1
        items[placeholder] = MediaItem(
            id=placeholder,
            media_ref=src,
            alt=node.attrs.get("alt", "") or node.attrs.get("title", ""),
            tag=node.tag or "img",
        )
        node.replace_with(Node(None, text=placeholder))
    return items
