"""Minimal DOM built on stdlib html.parser.

The reference parses HTML with jsdom (gateway) and lxml-backed
trafilatura (extractor). Neither lxml nor selectolax is available in
this environment, so the DOM is a small pure-Python tree tuned for the
one consumer we have: the Readability-style content scorer. It is
tolerant of real-world tag soup (unclosed tags, stray end tags,
mis-nesting) the way browsers are: stray end tags pop to the nearest
matching open element or are ignored.

Performance note: this runs inside Arrow-batched pandas UDFs — one
Python call per batch of documents, parse cost amortized per document.
html.parser is ~5-20 MB/s per core; at 32 cores that is the compute
budget the skew-salting in operators/skew.py is sized around.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose open tag implicitly closes a prior sibling of the same
# (or listed) tag — enough HTML5 tree-construction to keep real pages sane.
_IMPLICIT_CLOSERS = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
}

BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body details dialog dd div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
        "hgroup hr li main nav ol p pre section table td th tr ul"
    ).split()
)


class Node:
    """Element or text node. ``tag is None`` ⇒ text node (payload in .text)."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(
        self,
        tag: Optional[str],
        attrs: Optional[dict[str, str]] = None,
        text: str = "",
    ) -> None:
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Optional[Node] = None
        self.text = text

    # -- tree ----------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def detach(self) -> None:
        """Remove this node from its parent."""
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def replace_with(self, other: "Node") -> None:
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        other.parent = parent
        parent.children[idx] = other
        self.parent = None

    def iter(self) -> Iterator["Node"]:
        """Depth-first pre-order over self and descendants."""
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            node = pop()
            yield node
            children = node.children
            if children:
                extend(reversed(children))

    def iter_elements(self, *tags: str) -> Iterator["Node"]:
        # one flat stack walk — not a generator over self.iter(): the
        # nested-generator form pays two frame switches per NODE and
        # this is the hottest loop of the extraction fast path
        want = frozenset(tags) if tags else None
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            node = pop()
            tag = node.tag
            if tag is not None and (want is None or tag in want):
                yield node
            children = node.children
            if children:
                extend(reversed(children))

    # -- attributes ----------------------------------------------------
    @property
    def class_attr(self) -> str:
        return self.attrs.get("class", "")

    @property
    def id_attr(self) -> str:
        return self.attrs.get("id", "")

    def class_and_id(self) -> str:
        attrs = self.attrs
        signal = getattr(attrs, "class_id_signal", None)
        if signal is not None:
            return signal()
        return f"{self.class_attr} {self.id_attr}"

    # -- text ----------------------------------------------------------
    def text_content(self) -> str:
        """Concatenated text of all descendant text nodes (no separators,
        matching DOM textContent semantics)."""
        parts: list[str] = []
        for node in self.iter():
            if node.tag is None:
                parts.append(node.text)
        return "".join(parts)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.tag is None:
            return f"#text({self.text[:30]!r})"
        return f"<{self.tag} class={self.class_attr!r} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True decodes entities into text nodes for free —
        # the analog of the reference's TextDecoder/entity handling
        # (usecase.ts:257).
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    def _open(self, tag: str, attrs: list[tuple[str, Optional[str]]], self_closing: bool) -> None:
        closers = _IMPLICIT_CLOSERS.get(tag)
        if closers and self.stack[-1].tag in closers:
            self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._open(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self._open(tag, attrs, self_closing=True)

    def handle_endtag(self, tag: str) -> None:
        # Pop to the nearest matching open element; ignore strays.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            top = self.stack[-1]
            # Merge adjacent text nodes to keep the tree small.
            if top.children and top.children[-1].tag is None:
                top.children[-1].text += data
            else:
                top.append(Node(None, text=data))


import re as _re

_PLACEHOLDER_RE = _re.compile(r"__CODEBLOCK_\d+__|__MEDIA_[A-Za-z0-9:_\-]+__")

# Per-node bottom-up annotation: (text_len, link_text_len, commas,
# has_placeholder, has_non_whitespace). One pass replaces the repeated
# text_content()/link_density() subtree walks (O(n·depth) string
# building) that dominated extraction CPU and, worse, its memory
# traffic — the allocation rate was what capped multi-core scaling.
Annotations = dict[int, tuple[int, int, int, bool, bool]]


def annotate(root: "Node") -> Annotations:
    ann: Annotations = {}
    stack: list[tuple[Node, bool]] = [(root, False)]
    while stack:
        node, visited = stack.pop()
        if node.tag is None:
            t = node.text
            ann[id(node)] = (
                len(t),
                0,
                t.count(",") + t.count("、"),
                bool(_PLACEHOLDER_RE.search(t)),
                bool(t) and not t.isspace(),
            )
            continue
        if not visited:
            stack.append((node, True))
            for c in node.children:
                stack.append((c, False))
        else:
            tlen = link = commas = 0
            ph = nonws = False
            for c in node.children:
                ct, cl, cc, cp, cn = ann[id(c)]
                tlen += ct
                link += cl
                commas += cc
                ph = ph or cp
                nonws = nonws or cn
            if node.tag == "a":
                link = tlen
            ann[id(node)] = (tlen, link, commas, ph, nonws)
    return ann


def ann_link_density(ann: Annotations, node: "Node") -> float:
    tlen, link = ann[id(node)][0], ann[id(node)][1]
    if tlen == 0:
        return 0.0
    return min(1.0, link / tlen)


def parse_html(html: str) -> Node:
    """Parse an HTML string into a Node tree rooted at '#root'.

    Delegates to the regex-driven scanner in fastparse.py (2-4× faster
    and far lower allocation rate than html.parser — see that module's
    docstring); this html.parser-based builder is retained as the
    reference implementation for differential tests
    (tests/test_fastparse.py)."""
    from .fastparse import fast_parse_html

    try:
        return fast_parse_html(html)
    except Exception:
        # Tag-soup beyond repair: fall back to the stdlib builder —
        # one poison doc must never kill a batch (SURVEY §4 retry row).
        return parse_html_stdlib(html)


def parse_html_stdlib(html: str) -> Node:
    """html.parser-based reference tree builder."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    return builder.root


def link_density(node: Node) -> float:
    """Fraction of a node's text that sits inside <a> descendants."""
    total = len(node.text_content())
    if total == 0:
        return 0.0
    linked = 0
    for a in node.iter_elements("a"):
        linked += len(a.text_content())
    return min(1.0, linked / total)
