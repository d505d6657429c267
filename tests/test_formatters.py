"""SO/Reddit formatter goldens (FIXTURES.md §5; reference:
handlers/stackoverflow/usecase.ts:98-150, handlers/reddit/usecase.ts:99-176)."""

import json

import pytest

from claude_readability_hook_spark.core.formatters import (
    format_reddit,
    format_reddit_json,
    format_so_json,
    format_stackoverflow,
)

SO_QUESTION = {
    "items": [
        {
            "title": "How to foo in bar?",
            "body_markdown": "I want to foo.\n\n```python\nfoo()\n```",
            "owner": {"display_name": "asker01", "user_id": 111},
        }
    ],
    "has_more": False,
}
SO_ANSWERS = {
    "items": [
        {"body_markdown": "Use foo().", "owner": {"display_name": "answerer1"}, "score": 5},
        {"body": "<p>Another HTML answer</p>", "owner": {"user_id": 222}, "score": 2},
    ],
    "has_more": False,
}


class TestStackOverflow:
    def test_format_structure(self):
        r = format_stackoverflow(SO_QUESTION, SO_ANSWERS)
        assert r.title == "How to foo in bar?"
        assert r.text.startswith("# Question\n")
        assert "\n## Answer 1\nUse foo()." in r.text
        assert "\n## Answer 2 (HTML)\n<p>Another HTML answer</p>" in r.text
        assert r.engine == "so-api"

    def test_score_formula(self):
        r = format_stackoverflow(SO_QUESTION, SO_ANSWERS)
        # 200 (question) + 2*180 (answers) + 3*120 (asker01, answerer1, '222')
        expected = 200 + 2 * 180 + 3 * 120 + len(r.text) * 0.45
        assert r.score == pytest.approx(expected)

    def test_top5_slice(self):
        answers = {
            "items": [
                {"body_markdown": f"A{i}", "owner": {"display_name": f"u{i}"}} for i in range(8)
            ],
            "has_more": False,
        }
        r = format_stackoverflow(SO_QUESTION, answers)
        assert "## Answer 5" in r.text
        assert "## Answer 6" not in r.text
        # but authors counted over ALL answers (8 + asker)
        expected = 200 + 5 * 180 + 9 * 120 + len(r.text) * 0.45
        assert r.score == pytest.approx(expected)

    def test_owner_fallback_to_user_id(self):
        q = {"items": [{"title": "T", "body": "<p>b</p>", "owner": {"user_id": 7}}],
             "has_more": False}
        r = format_stackoverflow(q, {"items": [], "has_more": False})
        assert r.text.startswith("# Question (HTML)\n")
        assert r.score == pytest.approx(200 + 1 * 120 + len(r.text) * 0.45)

    def test_json_wrapper_and_fallback(self):
        good = json.dumps({"question": SO_QUESTION, "answers": SO_ANSWERS})
        assert format_so_json(good).success
        assert not format_so_json("{not json").success
        assert not format_so_json('{"question": 5}').success


REDDIT_POSTS = {
    "data": {
        "children": [
            {
                "kind": "t3",
                "data": {
                    "title": "Sample Reddit Thread",
                    "selftext": "Top post body",
                    "author": "op",
                    "subreddit": "test",
                },
            }
        ]
    }
}
REDDIT_COMMENTS = {
    "data": {
        "children": [
            {
                "kind": "t1",
                "data": {"body": "Top comment 1", "score": 10, "author": "u1", "replies": ""},
            },
            {
                "kind": "t1",
                "data": {
                    "body": "Top comment 2",
                    "score": 5,
                    "author": "u2",
                    "replies": {
                        "data": {
                            "children": [
                                {
                                    "kind": "t1",
                                    "data": {"body": "reply A", "score": 2, "author": "u3"},
                                }
                            ]
                        }
                    },
                },
            },
        ]
    }
}


class TestReddit:
    def test_format_structure(self):
        r = format_reddit(REDDIT_POSTS, REDDIT_COMMENTS)
        assert r.title == "Sample Reddit Thread"
        assert r.text.startswith("# Sample Reddit Thread\n")
        assert "_u/op in r/test_\n\nTop post body" in r.text
        assert "\n## Comment 1 (score:10, by:u1)\nTop comment 1" in r.text
        assert "\n## Comment 2 (score:5, by:u2)\nTop comment 2" in r.text
        assert "\n## Comment 3 (score:2, by:u3)\nreply A" in r.text

    def test_score_formula(self):
        r = format_reddit(REDDIT_POSTS, REDDIT_COMMENTS)
        # 3 comments * 100 + (10+5+2)*2 + 3 authors * 80 + len*0.3
        expected = 300 + 34 + 240 + len(r.text) * 0.3
        assert r.score == pytest.approx(expected)

    def test_negative_votes_clamped(self):
        comments = {
            "data": {
                "children": [
                    {"kind": "t1", "data": {"body": "x", "score": -50, "author": "a",
                                            "replies": ""}}
                ]
            }
        }
        r = format_reddit(REDDIT_POSTS, comments)
        expected = 100 + 0 + 80 + len(r.text) * 0.3
        assert r.score == pytest.approx(expected)

    def test_depth_limit_replies_of_replies_ignored(self):
        nested = {
            "data": {
                "children": [
                    {
                        "kind": "t1",
                        "data": {
                            "body": "top",
                            "score": 1,
                            "author": "a",
                            "replies": {
                                "data": {
                                    "children": [
                                        {
                                            "kind": "t1",
                                            "data": {
                                                "body": "depth1",
                                                "score": 1,
                                                "author": "b",
                                                "replies": {
                                                    "data": {
                                                        "children": [
                                                            {
                                                                "kind": "t1",
                                                                "data": {
                                                                    "body": "depth2",
                                                                    "score": 1,
                                                                    "author": "c",
                                                                },
                                                            }
                                                        ]
                                                    }
                                                },
                                            },
                                        }
                                    ]
                                }
                            },
                        },
                    }
                ]
            }
        }
        r = format_reddit(REDDIT_POSTS, nested)
        assert "depth1" in r.text
        assert "depth2" not in r.text  # depth ≤ 1 recursion (usecase.ts:166-173)

    def test_toplevel_and_reply_limits(self):
        comments = {
            "data": {
                "children": [
                    {"kind": "t1", "data": {"body": f"c{i}", "score": i, "author": f"u{i}",
                                            "replies": ""}}
                    for i in range(25)
                ]
            }
        }
        r = format_reddit(REDDIT_POSTS, comments)
        assert "## Comment 20" in r.text
        assert "## Comment 21" not in r.text  # top-20 limit

    def test_tuple_wrapper_and_fallback(self):
        good = json.dumps([REDDIT_POSTS, REDDIT_COMMENTS])
        assert format_reddit_json(good).success
        assert not format_reddit_json("[]").success
        assert not format_reddit_json('{"a":1}').success

    def test_comment_without_body_skipped(self):
        comments = {
            "data": {
                "children": [
                    {"kind": "t1", "data": {"score": 1, "author": "a", "replies": ""}},
                    {"kind": "t1", "data": {"body": "kept", "score": 1, "author": "b",
                                            "replies": ""}},
                ]
            }
        }
        r = format_reddit(REDDIT_POSTS, comments)
        assert "## Comment 1 (score:1, by:b)" in r.text
