"""StackOverflow / Reddit JSON → markdown formatters + composite scores.

Observable contract of the reference handlers:
  - SO: handlers/stackoverflow/usecase.ts:98-150 (format + score)
  - Reddit: handlers/reddit/usecase.ts:99-176 (format + flatten + score)
Format strings, slice limits, author-dedup, truncation points and score
arithmetic are matched exactly; golden vectors in tests/test_formatters.py.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional

from ..config import DEFAULT, EngineConfig
from .codeblocks import truncate_code_blocks


@dataclass
class HandlerResult:
    title: str
    text: str
    engine: str
    score: float
    success: bool
    error: Optional[str] = None


def _owner_name(owner: Optional[dict[str, Any]]) -> Optional[str]:
    if not owner:
        return None
    name = owner.get("display_name")
    if name:
        return name
    uid = owner.get("user_id")
    return str(uid) if uid is not None else None


def format_stackoverflow(
    question: dict[str, Any], answers: dict[str, Any], cfg: EngineConfig = DEFAULT
) -> HandlerResult:
    """F8 + A3 + W1 (top-5 answers slice)."""
    items = question.get("items") or []
    q = items[0] if items else {}
    title = q.get("title") or "StackOverflow Question"

    parts: list[str] = []
    if q.get("body_markdown"):
        parts.append(f"# Question\n{truncate_code_blocks(q['body_markdown'])}")
    elif q.get("body"):
        parts.append(f"# Question (HTML)\n{truncate_code_blocks(q['body'])}")

    answer_items = answers.get("items") or []
    top_answers = answer_items[: cfg.so_top_answers_limit]
    for i, answer in enumerate(top_answers):
        if answer.get("body_markdown"):
            parts.append(f"\n## Answer {i + 1}\n{truncate_code_blocks(answer['body_markdown'])}")
        elif answer.get("body"):
            parts.append(f"\n## Answer {i + 1} (HTML)\n{truncate_code_blocks(answer['body'])}")

    text = "\n".join(parts)

    # Unique authors over question + ALL answers (not just top slice) —
    # matches the reference (answers.items.map, usecase.ts:125-136).
    authors = {_owner_name(a.get("owner")) for a in answer_items}
    authors.add(_owner_name(q.get("owner")))
    authors.discard(None)
    authors.discard("")

    score = (
        (cfg.so_question_points if items else 0.0)
        + len(top_answers) * cfg.so_answer_points
        + len(authors) * cfg.so_author_points
        + len(text) * cfg.so_length_factor
    )
    return HandlerResult(title, text, "so-api", score, True)


def _flatten_comments(
    comment: dict[str, Any], depth: int, cfg: EngineConfig
) -> list[dict[str, Any]]:
    """Reference flattenComments (reddit/usecase.ts:153-176): emit the
    comment, then at depth 0 only, up to 5 replies (depth-1 recursion)."""
    out: list[dict[str, Any]] = []
    body = comment.get("body")
    if not body:
        return out
    out.append(
        {
            "body": truncate_code_blocks(body),
            "score": comment.get("score") or 0,
            "author": comment.get("author"),
        }
    )
    replies = comment.get("replies")
    if depth == 0 and isinstance(replies, dict):
        children = ((replies.get("data") or {}).get("children")) or []
        reply_data = [c.get("data") or {} for c in children]
        for reply in reply_data[: cfg.reddit_replies_per_top_limit]:
            out.extend(_flatten_comments(reply, 1, cfg))
    return out


def format_reddit(
    posts: dict[str, Any], comments: dict[str, Any], cfg: EngineConfig = DEFAULT
) -> HandlerResult:
    """F9 + A4 + W2/W3 (top-20 comments, 5 replies per top, depth ≤ 1)."""
    post_children = ((posts.get("data") or {}).get("children")) or []
    post = (post_children[0].get("data") or {}) if post_children else {}
    title = post.get("title") or "Reddit Thread"

    parts: list[str] = [f"# {title}"]
    if post.get("selftext"):
        parts.append(
            f"_u/{post.get('author')} in r/{post.get('subreddit')}_\n\n"
            f"{truncate_code_blocks(post['selftext'])}"
        )

    comment_children = ((comments.get("data") or {}).get("children")) or []
    top_level = [c.get("data") or {} for c in comment_children][: cfg.reddit_toplevel_limit]

    flattened: list[dict[str, Any]] = []
    for comment in top_level:
        flattened.extend(_flatten_comments(comment, 0, cfg))

    authors = {c["author"] for c in flattened if c.get("author")}

    for i, comment in enumerate(flattened):
        parts.append(
            f"\n## Comment {i + 1} (score:{comment['score']}, by:{comment['author']})\n"
            f"{comment['body']}"
        )

    text = "\n".join(parts).strip()
    total_votes = sum(max(0, c["score"]) for c in flattened)
    score = (
        len(flattened) * cfg.reddit_comment_points
        + total_votes * cfg.reddit_vote_factor
        + len(authors) * cfg.reddit_author_points
        + len(text) * cfg.reddit_length_factor
    )
    return HandlerResult(title, text, "reddit-json", score, True)


def format_so_json(raw: str, cfg: EngineConfig = DEFAULT) -> HandlerResult:
    """Parse a combined SO payload ``{"question": {...}, "answers": {...}}``
    (our span encoding of the two API responses) and format it.
    Parse failure → success=False so the pipeline falls back to the
    default HTML path, mirroring orElse (usecase.ts:51-56)."""
    try:
        payload = json.loads(raw)
        question = payload.get("question") or {"items": [], "has_more": False}
        answers = payload.get("answers") or {"items": [], "has_more": False}
        if not isinstance(question.get("items"), list) or not isinstance(
            answers.get("items"), list
        ):
            raise ValueError("missing items")
        return format_stackoverflow(question, answers, cfg)
    except (ValueError, TypeError, AttributeError, json.JSONDecodeError) as exc:
        return HandlerResult("", "", "so-api", 0.0, False, f"invalid SO JSON: {exc}")


def format_reddit_json(raw: str, cfg: EngineConfig = DEFAULT) -> HandlerResult:
    """Parse the Reddit two-listing tuple ``[posts, comments]``
    (reddit/usecase.ts:47-60) and format it."""
    try:
        payload = json.loads(raw)
        if not isinstance(payload, list) or len(payload) < 2:
            raise ValueError("expected [posts, comments] tuple")
        return format_reddit(payload[0], payload[1], cfg)
    except (ValueError, TypeError, AttributeError, json.JSONDecodeError) as exc:
        return HandlerResult("", "", "reddit-json", 0.0, False, f"invalid Reddit JSON: {exc}")
