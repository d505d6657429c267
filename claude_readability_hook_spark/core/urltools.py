"""URL transforms, SSRF predicates, hostname routing (SURVEY §2.2, §2.8).

Pure functions; the Spark layer exposes the same logic as Column
expressions in functions/columns.py, and these are the oracle used by
unit tests (vectors from reference tests
tests/unit/features/extract/url-transforms.test.ts and
tests/unit/lib/ssrf-guard.test.ts).
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

BLOCKED_PORTS = frozenset({22, 3306, 5432, 6379, 9200, 27017})

# Private/reserved IPv4 + IPv6 literal ranges and localhost names
# (semantics of reference ssrf-guard.ts:94-139, re-derived).
_PRIVATE_IP_RE = re.compile(
    r"^(?:"
    r"127\.|10\.|0\.|169\.254\.|192\.168\.|"
    r"172\.(?:1[6-9]|2\d|3[01])\.|"
    r"100\.(?:6[4-9]|[7-9]\d|1[01]\d|12[0-7])\.|"
    r"198\.1[89]\.|192\.0\.0\.|192\.0\.2\.|198\.51\.100\.|203\.0\.113\.|"
    r"2(?:2[4-9]|3\d|4\d|5[0-5])\."
    r")"
)
_PRIVATE_IPV6_RE = re.compile(
    r"^\[?(?:::1|::ffff:|f[cd][0-9a-f]{2}:|fe80:)", re.IGNORECASE
)
_LOCALHOST_NAMES = frozenset({"localhost", "localhost.localdomain", "ip6-localhost", "ip6-loopback"})


def transform_amp(url: str) -> str:
    """F1: strip /amp/ or trailing /amp from the path
    (usecase.ts:302-311)."""
    parts = urlsplit(url)
    path = parts.path
    if "/amp/" in path or path.endswith("/amp"):
        path = re.sub(r"/amp/?$", "", path) or "/"
        if path != "/" and path.endswith("/"):
            path = path[:-1]
    return urlunsplit((parts.scheme, parts.netloc, path, parts.query, parts.fragment))


def transform_mobile(url: str) -> str:
    """F2: m. / mobile. host prefix → www. (usecase.ts:313-319)."""
    parts = urlsplit(url)
    host = parts.hostname or ""
    if host.startswith("m.") or host.startswith("mobile."):
        new_host = re.sub(r"^(mobile\.|m\.)", "www.", host)
        netloc = parts.netloc.replace(host, new_host, 1)
        return urlunsplit((parts.scheme, netloc, parts.path, parts.query, parts.fragment))
    return url


def transform_print(url: str) -> str:
    """F3: delete `print` and `plain` query params — lowercase keys only,
    uppercase preserved by design (url-transforms.test.ts:250-255)."""
    parts = urlsplit(url)
    if not parts.query:
        return url
    kept = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if k not in ("print", "plain")]
    return urlunsplit(
        (parts.scheme, parts.netloc, parts.path, urlencode(kept), parts.fragment)
    )


def transform_url(url: str) -> str:
    """amp ∘ mobile ∘ print, composed in reference order
    (usecase.ts:295-300); idempotent."""
    return transform_print(transform_mobile(transform_amp(url)))


def is_valid_url(url: str) -> bool:
    """O1: http/https, no embedded credentials, no blocked port
    (ssrf-guard.ts:6-24)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    if parts.scheme not in ("http", "https"):
        return False
    if "@" in parts.netloc:
        return False
    try:
        port = parts.port
    except ValueError:
        return False
    if port is not None and port in BLOCKED_PORTS:
        return False
    return bool(parts.hostname)


def host_is_private(host: str) -> bool:
    """O2 (literal checks only): private/reserved IP literals and
    localhost names. The reference's DNS re-resolution branch
    (ssrf-guard.ts:48-67) is a non-goal in batch — not deterministic."""
    h = host.strip().lower().rstrip(".")
    if h in _LOCALHOST_NAMES:
        return True
    if _PRIVATE_IP_RE.match(h):
        return True
    if _PRIVATE_IPV6_RE.match(h):
        return True
    return False


def route_tag(host: str) -> str:
    """O4 hostname dispatch (usecase.ts:48-69)."""
    h = (host or "").lower()
    if h == "stackoverflow.com" or h.endswith(".stackoverflow.com"):
        return "so"
    if h in ("reddit.com", "redd.it") or h.endswith(".reddit.com") or h.endswith(".redd.it"):
        return "reddit"
    return "html"


def extract_question_id(path: str) -> str | None:
    """F10: /questions/(\\d+) (handlers/stackoverflow/usecase.ts:152-155)."""
    m = re.search(r"/questions/(\d+)\b", path)
    return m.group(1) if m else None


def is_reddit_thread(path: str) -> bool:
    """F10: /comments/[A-Za-z0-9]+ (handlers/reddit/usecase.ts:178)."""
    return bool(re.search(r"/comments/[A-Za-z0-9]+", path))
