"""Code lift/splice + truncation boundaries (reference:
tests/unit/lib/text-utils.test.ts:5-223, code-block-preserver.ts)."""

from claude_readability_hook_spark.core.codeblocks import (
    lift_code_blocks,
    restore_in_text,
    truncate_code_blocks,
    truncate_code_body,
)
from claude_readability_hook_spark.core.dom import parse_html


def _fence(n_lines: int, lang: str = "") -> str:
    body = "\n".join(f"l{i}" for i in range(n_lines))
    return f"```{lang}\n{body}\n```"


class TestTruncation:
    def test_199_lines_unchanged(self):
        s = _fence(199)
        assert truncate_code_blocks(s) == s

    def test_200_lines_unchanged(self):
        # body between ``` has 200 content lines + trailing \n → split
        # yields 201 entries in the reference too; at-limit NOT truncated
        body = "\n".join(f"l{i}" for i in range(200))
        s = f"```\n{body}```"
        assert truncate_code_blocks(s) == s

    def test_201_lines_truncated_with_marker(self):
        body = "\n".join(f"l{i}" for i in range(201))
        out = truncate_code_blocks(f"```\n{body}```")
        assert "... [truncated 1 lines] ..." in out
        assert "l199" in out and "l200" not in out

    def test_language_preserved(self):
        body = "\n".join(f"l{i}" for i in range(250))
        out = truncate_code_blocks(f"```python\n{body}```")
        assert out.startswith("```python\n")
        assert "... [truncated 50 lines] ..." in out

    def test_pre_code_html(self):
        body = "\n".join(f"l{i}" for i in range(250))
        out = truncate_code_blocks(f"<pre><code>{body}</code></pre>")
        assert "... [truncated 50 lines] ..." in out
        assert out.startswith("<pre><code>")

    def test_bare_pre(self):
        body = "\n".join(f"l{i}" for i in range(250))
        out = truncate_code_blocks(f'<pre class="x">{body}</pre>')
        assert "... [truncated 50 lines] ..." in out
        assert out.startswith('<pre class="x">')

    def test_pre_containing_code_not_double_processed(self):
        body = "\n".join(f"l{i}" for i in range(250))
        src = f"<pre><code>{body}</code></pre>"
        out = truncate_code_blocks(src)
        assert out.count("... [truncated") == 1

    def test_unclosed_fence_unchanged(self):
        s = "```python\n" + "\n".join(f"l{i}" for i in range(300))
        assert truncate_code_blocks(s) == s

    def test_body_helper_boundary(self):
        assert truncate_code_body("\n".join(["x"] * 200)) == "\n".join(["x"] * 200)
        out = truncate_code_body("\n".join(["x"] * 201))
        assert out.endswith("... [truncated 1 lines] ...")


class TestLiftAndRestore:
    def test_pre_lifted_with_language_from_class(self):
        root = parse_html(
            '<div><pre><code class="language-rust">fn main() {}</code></pre></div>'
        )
        blocks = lift_code_blocks(root)
        assert len(blocks) == 1
        b = blocks["__CODEBLOCK_0__"]
        assert b.content == "fn main() {}"
        assert b.language == "rust"
        assert not b.is_inline
        assert "__CODEBLOCK_0__" in root.text_content()

    def test_data_lang_attribute(self):
        # detectLanguage targets the <code> element when present
        # (code-block-preserver.ts:22); data-lang on <pre> alone is only
        # read when there is no <code> child.
        root = parse_html('<pre><code data-lang="go">x</code></pre>')
        assert lift_code_blocks(root)["__CODEBLOCK_0__"].language == "go"
        root2 = parse_html('<pre data-lang="rb">y</pre>')
        assert lift_code_blocks(root2)["__CODEBLOCK_0__"].language == "rb"

    def test_inline_code_lifted_after_pres(self):
        root = parse_html("<p>use <code>foo()</code> here</p><pre>block</pre>")
        blocks = lift_code_blocks(root)
        # pres first (DOM order), then inline codes — reference order
        assert blocks["__CODEBLOCK_0__"].content == "block"
        assert blocks["__CODEBLOCK_1__"].content == "foo()"
        assert blocks["__CODEBLOCK_1__"].is_inline

    def test_code_inside_pre_not_doubly_lifted(self):
        root = parse_html("<pre><code>only once</code></pre>")
        assert len(lift_code_blocks(root)) == 1

    def test_restore_order_and_formats(self):
        root = parse_html(
            "<p>start <code>inline</code> mid</p><pre><code class='lang-js'>var x;</code></pre>"
        )
        blocks = lift_code_blocks(root)
        text = root.text_content()
        out = restore_in_text(text, blocks)
        assert "`inline`" in out
        assert "```js\nvar x;\n```" in out
        assert out.index("`inline`") < out.index("```js")

    def test_missing_placeholder_dropped_silently(self):
        root = parse_html("<pre>gone</pre>")
        blocks = lift_code_blocks(root)
        out = restore_in_text("text without the placeholder", blocks)
        assert out == "text without the placeholder"

    def test_blank_line_collapse_after_restore(self):
        root = parse_html("<pre>c</pre>")
        blocks = lift_code_blocks(root)
        out = restore_in_text("a\n\n\n\n__CODEBLOCK_0__\n\n\n\nb", blocks)
        assert "\n\n\n" not in out
