"""Code-block placeholder lift / splice + truncation.

Reimplements the observable contract of the reference's
CodeBlockPreserver (apps/gateway/src/lib/extraction/code-block-preserver.ts)
and truncateCodeBlocks (apps/gateway/src/lib/text-utils.ts):

  - every <pre> (then every inline <code> not inside <pre>) is replaced
    by a text-node placeholder ``__CODEBLOCK_<n>__`` in DOM order
    (code-block-preserver.ts:14-51,76-78)
  - language detected from class patterns language-/lang-/hljs-/brush:/
    code- then data-lang/data-language attributes (:80-96)
  - restore splices blocks back **in order of first appearance in the
    text** as `` `inline` `` or fenced blocks, then collapses blank
    lines and trims (:53-68)
  - truncation caps any code body at 200 lines, appending
    ``... [truncated N lines] ...`` — blocks of exactly 200 lines are
    NOT truncated (text-utils.ts:7-51; boundary asserted by
    tests/unit/lib/text-utils.test.ts:22-27)

This is exactly the interleaved-span contract: placeholders are spans
with kind='code' and media_ref=placeholder id; order preservation here
is what the golden span-equality tests check.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .dom import Node
from .textnorm import collapse_blank_lines

MAX_CODE_LINES = 200

_LANG_CLASS_PATTERNS = [
    re.compile(r"language-([a-zA-Z0-9]+)"),
    re.compile(r"lang-([a-zA-Z0-9]+)"),
    re.compile(r"hljs-([a-zA-Z0-9]+)"),
    re.compile(r"brush: *([a-zA-Z0-9]+)"),
    re.compile(r"code-([a-zA-Z0-9]+)"),
]


@dataclass
class CodeBlock:
    id: str
    content: str
    language: Optional[str]
    is_inline: bool


def detect_language(node: Node) -> Optional[str]:
    cls = node.class_attr
    for pattern in _LANG_CLASS_PATTERNS:
        m = pattern.search(cls)
        if m:
            return m.group(1)
    return node.attrs.get("data-lang") or node.attrs.get("data-language") or None


def lift_code_blocks(root: Node, start: int = 0) -> dict[str, CodeBlock]:
    """Replace <pre> (then inline <code>) elements with placeholder text
    nodes, returning the side table of lifted blocks.

    Mutates the tree in place. Placeholder ids are assigned in DOM
    order — the ordinal that becomes the span `offset` downstream.
    ``start`` continues the per-DOCUMENT counter across multiple html
    spans so placeholder ids stay unique within a document (the
    reference's counter lives on the per-request preserver instance,
    code-block-preserver.ts:10-12)."""
    blocks: dict[str, CodeBlock] = {}
    counter = start

    pres = list(root.iter_elements("pre"))
    for pre in pres:
        if pre.parent is None:  # nested pre already lifted with its ancestor
            continue
        placeholder = f"__CODEBLOCK_{counter}__"
        counter += 1
        code_child = next(pre.iter_elements("code"), None)
        content = (code_child.text_content() if code_child is not None else pre.text_content())
        blocks[placeholder] = CodeBlock(
            id=placeholder,
            content=content.strip(),
            language=detect_language(code_child if code_child is not None else pre),
            is_inline=False,
        )
        pre.replace_with(Node(None, text=placeholder))

    # Inline <code> not inside <pre> — all remaining <code> after the pre
    # pass, since pre subtrees were detached above.
    for code in list(root.iter_elements("code")):
        if code.parent is None:
            continue
        placeholder = f"__CODEBLOCK_{counter}__"
        counter += 1
        blocks[placeholder] = CodeBlock(
            id=placeholder,
            content=code.text_content().strip(),
            language=detect_language(code),
            is_inline=True,
        )
        code.replace_with(Node(None, text=placeholder))

    return blocks


def truncate_code_body(body: str, max_lines: int = MAX_CODE_LINES) -> str:
    """Cap a raw code body at max_lines; at-limit bodies unchanged."""
    lines = body.split("\n")
    if len(lines) <= max_lines:
        return body
    head = "\n".join(lines[:max_lines])
    tail = len(lines) - max_lines
    return f"{head}\n... [truncated {tail} lines] ..."


def render_code_block(block: CodeBlock, truncate: bool = True) -> str:
    """Markdown rendering used at splice time (code-block-preserver.ts:60-63)."""
    if block.is_inline:
        return f"`{block.content}`"
    body = truncate_code_body(block.content) if truncate else block.content
    return f"\n\n```{block.language or ''}\n{body}\n```\n\n"


def restore_in_text(text: str, blocks: dict[str, CodeBlock], truncate: bool = True) -> str:
    """Splice lifted blocks back into extracted text, ordered by first
    appearance in the text (code-block-preserver.ts:56-58); placeholders
    whose neighborhood was dropped by extraction vanish silently, like
    the reference's no-op String.replace on a missing id."""
    present = [(text.find(pid), pid) for pid in blocks]
    restored = text
    for pos, pid in sorted(present):
        if pos < 0:
            continue
        restored = restored.replace(pid, render_code_block(blocks[pid], truncate), 1)
    return collapse_blank_lines(restored)


# ---------------------------------------------------------------------------
# String-level truncation over already-formatted content (text-utils.ts) —
# used by the SO/Reddit formatters, which receive markdown/HTML strings.
# ---------------------------------------------------------------------------

_FENCE = re.compile(r"```([a-zA-Z0-9_-]*)\n([\s\S]*?)```")
_PRE_CODE = re.compile(r"<pre[^>]*><code[^>]*>([\s\S]*?)</code></pre>", re.IGNORECASE)
_PRE_BARE = re.compile(r"<pre([^>]*)>([\s\S]*?)</pre>", re.IGNORECASE)


def truncate_code_blocks(text: str, max_lines: int = MAX_CODE_LINES) -> str:
    """Truncate fenced / <pre><code> / bare <pre> blocks in a formatted
    string to max_lines each (text-utils.ts:7-51)."""

    def fence_repl(m: re.Match) -> str:
        lang, body = m.group(1), m.group(2)
        lines = body.split("\n")
        if len(lines) <= max_lines:
            return f"```{lang}\n{body}```"
        head = "\n".join(lines[:max_lines])
        tail = len(lines) - max_lines
        return f"```{lang}\n{head}\n... [truncated {tail} lines] ...\n```"

    def pre_code_repl(m: re.Match) -> str:
        body = m.group(1)
        lines = body.split("\n")
        if len(lines) <= max_lines:
            return m.group(0)
        head = "\n".join(lines[:max_lines])
        tail = len(lines) - max_lines
        return m.group(0).replace(body, f"{head}\n... [truncated {tail} lines] ...")

    def pre_bare_repl(m: re.Match) -> str:
        attrs, body = m.group(1), m.group(2)
        if "<code" in body:
            return m.group(0)
        lines = body.split("\n")
        if len(lines) <= max_lines:
            return m.group(0)
        head = "\n".join(lines[:max_lines])
        tail = len(lines) - max_lines
        return f"<pre{attrs}>{head}\n... [truncated {tail} lines] ...</pre>"

    text = _FENCE.sub(fence_repl, text)
    text = _PRE_CODE.sub(pre_code_repl, text)
    text = _PRE_BARE.sub(pre_bare_repl, text)
    return text
