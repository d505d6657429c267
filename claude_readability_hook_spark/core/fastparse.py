"""Fast regex-driven HTML tokenizer → Node tree.

stdlib html.parser walks the input char-by-char through _markupbase
and eagerly parses EVERY attribute of EVERY tag; profiling showed it
at 62% of extraction CPU, and its allocation rate is what capped
multi-core scaling (allocator/memory-bandwidth contention at 8+
procs). This scanner:

  - tokenizes with one compiled regex (the scan loop runs in C)
  - parses attributes LAZILY — stored as the raw attr string, decoded
    only when a consumer actually reads them (the extractor touches
    class/id on a minority of nodes)
  - decodes entities only when '&' is present in a text node

Produces the same Node tree contract as dom.parse_html (void
elements, implicit <p>/<li>/... closing, script/style raw text,
tag-soup tolerance). dom.parse_html delegates here; the html.parser
builder remains as reference implementation for differential tests.
"""

from __future__ import annotations

import html as _html
import re

from .dom import _IMPLICIT_CLOSERS, VOID_ELEMENTS, Node

# One token per match: comment / doctype-or-pi / end tag / start tag / text.
_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"  # comment (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # CDATA
    r"|<![^>]*>"  # doctype / declaration
    r"|<\?[^>]*>"  # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_\-]*)\s*>"  # 1: end tag
    r"|<([a-zA-Z][a-zA-Z0-9:_\-]*)"  # 2: start tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)"  # 3: raw attrs
    r"(/?)>"  # 4: self-closing slash
    , re.DOTALL,
)

_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
    "textarea": re.compile(r"</textarea\s*>", re.IGNORECASE),
    "title": re.compile(r"</title\s*>", re.IGNORECASE),
}

_ATTR = re.compile(
    r"([a-zA-Z_:][a-zA-Z0-9:._\-]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)


def parse_attrs(raw: str) -> dict[str, str]:
    """Decode a raw attribute string on demand."""
    attrs: dict[str, str] = {}
    if not raw:
        return attrs
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in ("'", '"'):
            val = val[1:-1]
        if "&" in val:
            val = _html.unescape(val)
        attrs.setdefault(name, val)
    return attrs


class LazyAttrs(dict):
    """Dict facade that decodes the raw attr string on first access."""

    __slots__ = ("_raw",)

    def __init__(self, raw: str) -> None:
        super().__init__()
        self._raw = raw

    def _load(self) -> None:
        if self._raw is not None:
            raw, self._raw = self._raw, None
            super().update(parse_attrs(raw))

    def __getitem__(self, key):  # noqa: D105
        self._load()
        return super().__getitem__(key)

    def get(self, key, default=None):
        self._load()
        return super().get(key, default)

    def __contains__(self, key):  # noqa: D105
        self._load()
        return super().__contains__(key)

    def __iter__(self):  # noqa: D105
        self._load()
        return super().__iter__()

    def __len__(self):  # noqa: D105
        self._load()
        return super().__len__()

    def items(self):
        self._load()
        return super().items()

    def keys(self):
        self._load()
        return super().keys()

    def values(self):
        self._load()
        return super().values()

    def class_id_signal(self) -> str:
        """Fast path for the boilerplate stripper: '' without parsing
        when the raw attr string cannot contain class/id (the stripper
        reads class+id of EVERY element, which would defeat laziness)."""
        raw = self._raw
        if raw is not None and "class" not in raw and "id" not in raw:
            return " "
        return f"{self.get('class', '')} {self.get('id', '')}"


def _add_text(parent: Node, text: str) -> None:
    if not text:
        return
    if "&" in text:
        text = _html.unescape(text)
    children = parent.children
    if children and children[-1].tag is None:
        children[-1].text += text
    else:
        node = Node(None, text=text)
        node.parent = parent
        children.append(node)


def fast_parse_html(html: str) -> Node:
    root = Node("#root")
    stack = [root]
    n = len(html)

    i = 0
    while i < n:
        m = _TOKEN.search(html, i)
        if m is None:
            _add_text(stack[-1], html[i:])
            break
        start = m.start()
        if start > i:
            _add_text(stack[-1], html[i:start])
        i = m.end()

        end_name, start_name, raw_attrs, slash = m.group(1, 2, 3, 4)
        if end_name is not None:
            name = end_name.lower()
            for k in range(len(stack) - 1, 0, -1):
                if stack[k].tag == name:
                    del stack[k:]
                    break
            continue

        if start_name is None:
            continue  # comment / doctype / CDATA / PI — skipped
        name = start_name.lower()

        top = stack[-1]
        closers = _IMPLICIT_CLOSERS.get(name)
        if closers and top.tag in closers:
            stack.pop()
            top = stack[-1]

        node = Node.__new__(Node)
        node.tag = name
        node.attrs = LazyAttrs(raw_attrs)
        node.children = []
        node.parent = top
        node.text = ""
        top.children.append(node)

        if slash == "/" or name in VOID_ELEMENTS:
            continue

        raw_close = _RAWTEXT_CLOSE.get(name)
        if raw_close is not None:
            cm = raw_close.search(html, i)
            if cm is None:
                _add_text(node, html[i:])
                i = n
            else:
                _add_text(node, html[i : cm.start()])
                i = cm.end()
            continue

        stack.append(node)

    return root
