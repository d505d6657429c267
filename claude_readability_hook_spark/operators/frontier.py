"""Crawl-frontier politeness scheduling: per-host fetch slots, host
budgets, and host-affine fetcher sharding — the planning stage between
"candidate URL list" and "fetch fleet" that every polite crawler runs
(the reference serves single requests behind a gateway and never plans
a crawl; at 10^12 candidate URLs the plan IS the crawler).

Three invariants, each engine-portable:

- **Host affinity**: fetcher_id = h32(host) % n_fetchers. A host's
  URLs all land on ONE fetcher whatever the cluster size, so rate
  limits need no cross-worker coordination — the politeness property
  that makes the fleet embarrassingly parallel. Pure expression, no
  shuffle.
- **Per-host ordering**: slot = rank of the URL within its host by
  (priority DESC, url ASC) — deterministic tie-break, no nondeterministic
  row_number over unordered input. fetch_offset_ms = slot · crawl
  delay: the fetcher replays its hosts' slots on a clock and is polite
  by construction.
- **Host budget**: slots ≥ budget are keep=false with a reason column
  (the frontier analog of the bucket-cap quarantine discipline) — a
  mega-host cannot starve the round.

Scale shape: ONE narrow shuffle (the per-host rank window) carrying
(url, host, priority) rows — never page bytes. For mega-hosts whose
row sets would make a single window partition uncomfortable, the
salted two-phase plan (``trim_salts``): phase 1 ranks within (host,
salt=h32(url)%trim_salts) and keeps each salt's top-budget (a
superset of the true top-budget, by the standard distributed top-k
argument), phase 2 re-ranks the ≤ trim_salts·budget survivors
exactly — the kept rows' slots are bit-equal to the direct plan's
(differential-tested), with the heavy partition split ``trim_salts``
ways. Since r8 the DEFAULT is the counted AUTO regime: one narrow
count detects hosts above ``hot_host_rows`` and routes exactly those
through the salted plan while the long tail keeps the direct plan —
the same measure-then-pick pattern as skew.hot_key_salted_repartition
and canonicalize_media_refs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32_expr

FRONTIER_FETCHERS = 64
FRONTIER_DELAY_MS = 1000

# URL component extraction, shared by url_quality / robots_gate /
# jobs/frontier_job.py. The scheme match is case-insensitive ('HTTP://'
# is a valid URL; a case-sensitive match would yield empty host+path
# and silently bypass every gate). _URL_PATHQ_RE keeps the query
# (robots rules like 'Disallow: /search?q=' match against path+query
# per the Google spec); _URL_PATH_RE is path-only (depth features).
_URL_HOST_RE = r"(?i)^[a-z]+://([^/?#]+)"
_URL_PATH_RE = r"(?i)^[a-z]+://[^/?#]+([^?#]*)"
_URL_PATHQ_RE = r"(?i)^[a-z]+://[^/?#]+([^#]*)"


FRONTIER_HOT_HOST_ROWS = 1_000_000
FRONTIER_AUTO_SALTS = 16


def schedule_frontier(
    urls: DataFrame,
    n_fetchers: int = FRONTIER_FETCHERS,
    delay_ms: int = FRONTIER_DELAY_MS,
    host_budget: int | None = None,
    trim_salts: int | str | None = "auto",
    hot_host_rows: int = FRONTIER_HOT_HOST_ROWS,
    auto_salts: int = FRONTIER_AUTO_SALTS,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
) -> DataFrame:
    """(url, host, fetcher_id, slot, fetch_offset_ms, keep) for every
    candidate URL. slot is 0-based within host by (priority DESC, url
    ASC); keep=false marks rows past host_budget (never dropped here —
    the caller decides quarantine vs defer). trim_salts (requires
    host_budget) switches to the salted two-phase plan and emits the
    KEPT rows only — their (slot, fetcher, offset) are bit-equal to
    the direct plan's keep=true rows (differential-tested); the
    trimmed tail is exactly what a mega-host run doesn't want to
    materialize.

    **AUTO regime (default)** — the measured-then-pick discipline
    (canonicalize_media_refs / _lm_broadcast_auto pattern): when
    host_budget is set, one narrow map-side-combined count detects
    hosts with > hot_host_rows candidate URLs; exactly those flow
    through the salted two-phase plan (auto_salts stripes) while the
    long tail keeps the direct single-window plan INCLUDING its
    keep=false over-budget rows. A mega-host (a blogging platform with
    10⁸ candidate URLs) can no longer straggle the round under the
    default call — its window partition is split auto_salts ways and
    its untrimmed tail (the 10⁸ − budget rows nobody wants
    materialized) is dropped, which is the point of detecting it.
    The hot-host set is bounded by total_rows / hot_host_rows, so the
    routing semi/anti joins broadcast it. Pass trim_salts=None to
    force the direct plan or an int to salt every host (both are the
    pre-auto behaviors, kept as overrides)."""
    base = urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(priority_col).alias("priority"),
    )
    if trim_salts == "auto":
        if host_budget is None:
            trim_salts = None  # nothing to trim to — direct plan
        else:
            # the auto regime references `base` three times (detection
            # count, hot left_semi branch, cold left_anti branch) —
            # cache the narrow (url, host, priority) projection so an
            # expensive upstream lineage (url_quality + composed-
            # priority joins in frontier_job) is not replayed per
            # branch; lazy persist piggybacks on the detection count's
            # job (an eager checkpoint would pay its own extra job)
            base = base.persist()
            hot_hosts = F.broadcast(
                base.groupBy("host")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > hot_host_rows)
                .select("host")
            )
            kwargs = dict(
                n_fetchers=n_fetchers,
                delay_ms=delay_ms,
                host_budget=host_budget,
            )
            hot = schedule_frontier(
                base.join(hot_hosts, "host", "left_semi"),
                trim_salts=auto_salts,
                **kwargs,
            )
            cold = schedule_frontier(
                base.join(hot_hosts, "host", "left_anti"),
                trim_salts=None,
                **kwargs,
            )
            return hot.unionByName(cold)
    if trim_salts is not None:
        if host_budget is None:
            raise ValueError("trim_salts needs host_budget (it trims to it)")
        salted = Window.partitionBy(
            "host", h32_expr(F.col("url")) % trim_salts
        ).orderBy(F.col("priority").desc(), F.col("url"))
        # each salt keeps its own top-budget — a superset of the true
        # per-host top-budget, so the exact re-rank below sees every
        # final keeper (and only ≤ trim_salts·budget rows per host)
        base = (
            base.withColumn("salt_slot", F.row_number().over(salted) - 1)
            .filter(F.col("salt_slot") < host_budget)
            .drop("salt_slot")
        )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url")
    )
    out = base.select(
        "url",
        "host",
        (h32_expr(F.col("host")) % n_fetchers).cast("long").alias("fetcher_id"),
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
    ).withColumn("fetch_offset_ms", (F.col("slot") * delay_ms).cast("long"))
    if trim_salts is not None:
        # beyond-budget slots in the salted superset are only lower
        # bounds (phase 1 trimmed rows that may rank between) — emit
        # the exact keepers and nothing else
        return out.filter(F.col("slot") < host_budget).withColumn(
            "keep", F.lit(True)
        )
    keep = (
        F.lit(True)
        if host_budget is None
        else (F.col("slot") < host_budget)
    )
    return out.withColumn("keep", keep)


# RefinedWeb-style soft-ban URL fragments and their weights (Penedo et
# al. 2023 §3.1 use a weighted word list over the URL; this list is a
# small frozen stand-in with the same mechanics — the oracle SQL embeds
# the identical pairs).
URL_SOFTBAN_WORDS = (
    ("casino", 3),
    ("poker", 3),
    ("torrent", 2),
    ("warez", 3),
    ("coupon", 1),
    ("download", 1),
)


def url_quality(
    urls: DataFrame,
    url_col: str = "url",
    max_host_digit_micro: int = 200_000,
    max_host_hyphens: int = 3,
    max_path_depth: int = 8,
    max_url_len: int = 200,
    softban_threshold: int = 3,
) -> DataFrame:
    """RefinedWeb-style URL quality filter — the pre-fetch gate that
    runs BEFORE schedule_frontier so the fetch fleet never spends a
    slot on spam-shaped URLs: host digit fraction (machine-generated
    CDN/tracker hosts), host hyphen count (SEO keyword-stuffed
    domains), path depth, total length, query-parameter count, and a
    weighted soft-ban fragment score over the lowercased URL.

    Emits per-URL features plus the conjunction keep. The digit
    fraction is an exact micro-unit ratio (half-up int64 division) so
    the threshold comparison is engine-exact; every other feature is
    an integer count.

    Scale shape: pure in-row Column expressions over the URL column —
    zero Exchange; at 10^12 candidate URLs this is a free rider on
    the frontier scan, and dropping before scheduling shrinks the one
    rank shuffle schedule_frontier does pay for."""
    url = F.col(url_col)
    host = F.regexp_extract(url, _URL_HOST_RE, 1)
    path = F.regexp_extract(url, _URL_PATH_RE, 1)
    host_digits = F.length(host) - F.length(
        F.regexp_replace(host, r"[0-9]", "")
    )
    host_hyphens = F.length(host) - F.length(
        F.regexp_replace(host, r"-", "")
    )
    path_depth = F.length(path) - F.length(F.regexp_replace(path, r"/", ""))
    n_query_params = F.when(
        F.contains(url, F.lit("?")),
        F.lit(1)
        + F.length(url)
        - F.length(F.regexp_replace(url, r"&", "")),
    ).otherwise(F.lit(0))
    softban = sum(
        (
            F.contains(F.lower(url), F.lit(w)).cast("int") * F.lit(wt)
            for w, wt in URL_SOFTBAN_WORDS
        ),
        F.lit(0),
    )
    base = urls.select(
        url_col,
        host.alias("host"),
        F.length(host).cast("long").alias("host_len"),
        host_digits.cast("long").alias("host_digits"),
        host_hyphens.cast("long").alias("host_hyphens"),
        path_depth.cast("long").alias("path_depth"),
        n_query_params.cast("long").alias("n_query_params"),
        F.length(url).cast("long").alias("url_len"),
        softban.cast("long").alias("softban_score"),
    )
    digit_micro = F.when(
        F.col("host_len") > 0,
        F.expr(
            "(2 * host_digits * 1000000 + host_len) div (2 * host_len)"
        ),
    ).otherwise(F.lit(0))
    feat = base.select(
        url_col,
        "host",
        digit_micro.cast("long").alias("host_digit_micro"),
        "host_hyphens",
        "path_depth",
        "n_query_params",
        "url_len",
        "softban_score",
    )
    keep = (
        (F.col("host_digit_micro") <= max_host_digit_micro)
        & (F.col("host_hyphens") <= max_host_hyphens)
        & (F.col("path_depth") <= max_path_depth)
        & (F.col("url_len") <= max_url_len)
        & (F.col("softban_score") < softban_threshold)
    )
    return feat.select("*", keep.alias("keep"))


# whitespace-tolerant wildcard agent line: 'User-agent:*',
# 'user-agent:   *' and the canonical 'User-agent: *' all declare the
# same section (real robots.txt files use all three)
_WILDCARD_UA_RE = r"^user-agent:\s*\*$"


def compose_frontier_priority(
    urls: DataFrame,
    authority: DataFrame | None = None,
    domain_quality: DataFrame | None = None,
    w_authority: int = 1,
    w_quality: int = 1,
    w_url: int = 1,
    default_quality_micro: int = 500_000,
    url_col: str = "url",
    broadcast_signals: bool = True,
) -> DataFrame:
    """(url, host, domain, auth_micro, qual_micro, url_micro,
    priority_micro) — the composed fetch priority that closes the
    crawl loop on QUALITY: the signals the engine already computes
    feed the next round's frontier ordering.

      * auth_micro — the domain's PageRank (linkgraph.
        domain_pagerank_micro: (domain, rank_micro)) normalized to
        the corpus max as a half-up micro ratio; unknown domains get
        0 (no earned authority, no boost);
      * qual_micro — domains.domain_signals' quality_micro for the
        URL's registrable domain; unknown domains get
        default_quality_micro (unmeasured ≠ bad);
      * url_micro — the RefinedWeb url_quality features folded to one
        score: a keep=false URL scores 0, a keeper starts at 10⁶ and
        pays 10⁴ per soft-ban point, 2·10⁴ per host hyphen and
        5·10³ per path level;
      * priority_micro = (wₐ·auth + w_q·qual + wᵤ·url) div Σw —
        exact int64 end to end (authority scale 10¹² keeps
        2·rank·10⁶ under the int64 ceiling).

    Scale shape: both signal tables are domain-level (millions of
    rows, not trillions) so they broadcast by default; the URL
    features are the same zero-Exchange in-row expressions
    url_quality computes — composing priority adds NO shuffle to the
    frontier plan. The output drops straight into schedule_frontier
    (priority_col='priority_micro')."""
    from .domains import registrable_domain_expr

    feats = url_quality(urls.select(url_col), url_col=url_col)
    url_micro = F.when(
        F.col("keep"),
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(1_000_000)
            - 10_000 * F.col("softban_score")
            - 20_000 * F.col("host_hyphens")
            - 5_000 * F.col("path_depth"),
        ),
    ).otherwise(F.lit(0)).cast("long")
    base = feats.select(
        url_col,
        "host",
        registrable_domain_expr(F.col("host")).alias("domain"),
        url_micro.alias("url_micro"),
    )
    if authority is not None:
        auth = authority.select("domain", "rank_micro")
        mx = auth.agg(F.max("rank_micro").alias("max_rank"))
        if broadcast_signals:
            auth, mx = F.broadcast(auth), F.broadcast(mx)
        base = (
            base.join(auth, "domain", "left")
            .crossJoin(mx)
            .withColumn(
                "auth_micro",
                F.when(
                    F.col("rank_micro").isNotNull() & (F.col("max_rank") > 0),
                    F.expr(
                        "(2 * rank_micro * 1000000 + max_rank)"
                        " div (2 * max_rank)"
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
            .drop("rank_micro", "max_rank")
        )
    else:
        base = base.withColumn("auth_micro", F.lit(0).cast("long"))
    if domain_quality is not None:
        q = domain_quality.select("domain", "quality_micro")
        if broadcast_signals:
            q = F.broadcast(q)
        base = base.join(q, "domain", "left").withColumn(
            "qual_micro",
            F.coalesce(
                F.col("quality_micro"), F.lit(default_quality_micro)
            ).cast("long"),
        ).drop("quality_micro")
    else:
        base = base.withColumn(
            "qual_micro", F.lit(default_quality_micro).cast("long")
        )
    wsum = w_authority + w_quality + w_url
    return base.select(
        url_col,
        "host",
        "domain",
        "auth_micro",
        "qual_micro",
        "url_micro",
        F.expr(
            f"({w_authority} * auth_micro + {w_quality} * qual_micro"
            f" + {w_url} * url_micro) div {wsum}"
        ).cast("long").alias("priority_micro"),
    )


def _wildcard_section(body: Column) -> Column:
    """The `User-agent: *` section of a robots.txt body as an array of
    trimmed lowercased lines — first wildcard agent line (exclusive)
    to the next `user-agent:` line (exclusive), empty if absent.

    Both bounds are POSITIONAL (first index matching the predicate),
    never value lookups: `array_position(lines, value)` returns the
    value's FIRST occurrence in the whole file, so a robots.txt that
    repeats an agent line before and after the wildcard section would
    yield a bound BEFORE the section start and a negative slice length
    (a runtime abort). The slice length is also clamped ≥ 0 as a
    belt-and-braces guard."""
    lower = F.transform(
        F.split(body, F.lit("\n"), -1), lambda x: F.trim(F.lower(x))
    )
    indexed = F.transform(
        lower,
        lambda x, i: F.struct(
            x.alias("line"), (i + 1).cast("int").alias("idx")
        ),
    )
    ua_hits = F.filter(indexed, lambda r: r["line"].rlike(_WILDCARD_UA_RE))
    ua_idx = F.when(
        F.size(ua_hits) > 0, F.element_at(ua_hits, 1)["idx"]
    ).otherwise(F.lit(0))  # 1-based, 0 = absent
    next_hits = F.filter(
        indexed,
        lambda r: F.startswith(r["line"], F.lit("user-agent:"))
        & (r["idx"] > ua_idx),
    )
    next_idx = F.when(
        F.size(next_hits) > 0, F.element_at(next_hits, 1)["idx"]
    ).otherwise(F.size(lower) + 1)
    return F.when(
        ua_idx > 0,
        F.slice(
            lower,
            (ua_idx + 1).cast("int"),
            F.greatest(F.lit(0), next_idx - ua_idx - 1).cast("int"),
        ),
    ).otherwise(F.array().cast("array<string>"))


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, allow, path_prefix, rule_order) from raw robots.txt
    bodies — the `User-agent: *` section only (other agent sections
    are isolated and ignored), `Allow:`/`Disallow:` directives with
    non-empty path prefixes (an empty `Disallow:` means 'allow all'
    in robots semantics, i.e. a no-op rule, so it is dropped).

    Pure in-row array expressions: split lines, locate the wildcard
    section's bounds (first `user-agent: *` line to the next
    `user-agent:` line), slice, keep directive lines, emit one row
    per rule via a single explode. DuckDB twin uses the same indexed
    list lambdas. At 10^12 URLs the robots table is per-HOST (millions
    of rows, not trillions) — parsing is a rounding error and the
    output broadcasts."""
    section = _wildcard_section(F.col(body_col))
    directives = F.filter(
        section,
        lambda x: F.startswith(x, F.lit("allow:"))
        | F.startswith(x, F.lit("disallow:")),
    )
    rules = F.filter(
        F.transform(
            directives,
            lambda x, i: F.struct(
                F.startswith(x, F.lit("allow:")).alias("allow"),
                F.trim(
                    F.regexp_replace(x, r"^(allow|disallow):", "")
                ).alias("path_prefix"),
                (i + 1).cast("long").alias("rule_order"),
            ),
        ),
        lambda r: F.length(r["path_prefix"]) > 0,
    )
    return (
        robots.select(host_col, F.explode(rules).alias("r"))
        .select(
            host_col,
            F.col("r.allow").alias("allow"),
            F.col("r.path_prefix").alias("path_prefix"),
            F.col("r.rule_order").alias("rule_order"),
        )
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """(url, host, matched_prefix, allowed) — Google robots semantics:
    the LONGEST matching rule's verdict wins, allow wins prefix-length
    ties, and a URL with no matching rule is allowed.

    Scale shape: rules join on host — the rule table is per-host and
    df-small, so it broadcasts by default (set broadcast_rules=False
    for a shuffle-hash join when a pathological rule corpus outgrows
    the driver); the longest-match argmax is an in-row array reduce
    over each URL's OWN host's rules (collected per host first), so
    no per-(url, rule) row set ever materializes past the join.

    Rules match against PATH + QUERY (query-bearing prefixes like
    'Disallow: /search?q=' are common and must match), and the scheme
    match is case-insensitive — both per the shared _URL_* regexes."""
    host = F.regexp_extract(F.col(url_col), _URL_HOST_RE, 1)
    path = F.regexp_extract(F.col(url_col), _URL_PATHQ_RE, 1)
    per_host = rules.groupBy("host").agg(
        F.array_sort(
            F.collect_list(F.struct("path_prefix", "allow", "rule_order"))
        ).alias("rules")
    )
    if broadcast_rules:
        per_host = F.broadcast(per_host)
    u = urls.select(url_col, host.alias("host"), path.alias("path"))
    joined = u.join(per_host, "host", "left")
    matches = F.filter(
        F.coalesce(F.col("rules"), F.array().cast(
            "array<struct<path_prefix:string,allow:boolean,rule_order:bigint>>"
        )),
        lambda r: F.startswith(F.col("path"), r["path_prefix"]),
    )
    # lexicographic max of (prefix_len, allow) = longest match, allow
    # winning ties — exactly the Google precedence rule
    best = F.aggregate(
        matches,
        F.struct(
            F.lit(-1).cast("long").alias("plen"),
            F.lit(True).alias("allow"),
            F.lit("").alias("path_prefix"),
        ),
        lambda acc, r: F.when(
            (F.length(r["path_prefix"]) > acc["plen"])
            | (
                (F.length(r["path_prefix"]) == acc["plen"])
                & r["allow"]
                & ~acc["allow"]
            ),
            F.struct(
                F.length(r["path_prefix"]).cast("long").alias("plen"),
                r["allow"].alias("allow"),
                r["path_prefix"].alias("path_prefix"),
            ),
        ).otherwise(acc),
    )
    return joined.select(
        url_col,
        "host",
        best["path_prefix"].alias("matched_prefix"),
        best["allow"].alias("allowed"),
    )


def parse_sitemap_urls(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) from `Sitemap:` directives — per the robots
    spec these are GLOBAL (valid anywhere in the file, outside any
    agent section), so the scan covers every line, not just the
    wildcard section. One row per directive with a non-empty http(s)
    URL; the output is the sitemap FETCH list for the next crawl round
    (fetched bodies then feed parse_sitemaps). Pure in-row array
    expressions, per-host row counts — a rounding error at corpus
    scale."""
    lower = F.transform(
        F.split(F.col(body_col), F.lit("\n"), -1), lambda x: F.trim(x)
    )
    urls = F.filter(
        F.transform(
            F.filter(
                lower,
                lambda x: F.lower(x).rlike(r"^sitemap\s*:"),
            ),
            lambda x: F.trim(F.regexp_replace(x, r"(?i)^sitemap\s*:", "")),
        ),
        lambda u: u.rlike(r"(?i)^https?://"),
    )
    return robots.select(host_col, F.explode(urls).alias("sitemap_url"))


def parse_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    default_delay_ms: int = FRONTIER_DELAY_MS,
) -> DataFrame:
    """(host, delay_ms) from the wildcard section's `Crawl-delay: N`
    directive (seconds → milliseconds); hosts without one fall back to
    default_delay_ms. Non-integer values are treated as absent (the
    directive is non-standard and crawlers ignore garbage). The first
    crawl-delay line in the section wins."""
    section = _wildcard_section(F.col(body_col))
    delays = F.filter(
        F.transform(
            F.filter(section, lambda x: F.startswith(x, F.lit("crawl-delay:"))),
            lambda x: F.trim(F.regexp_replace(x, r"^crawl-delay:", "")),
        ),
        lambda v: v.rlike(r"^[0-9]+$"),
    )
    delay_ms = F.when(
        F.size(delays) > 0,
        F.element_at(delays, 1).cast("long") * 1000,
    ).otherwise(F.lit(default_delay_ms).cast("long"))
    return robots.select(host_col, delay_ms.alias("delay_ms"))


def schedule_frontier_with_delays(
    urls: DataFrame,
    delays: DataFrame,
    n_fetchers: int = FRONTIER_FETCHERS,
    default_delay_ms: int = FRONTIER_DELAY_MS,
    host_budget: int | None = None,
    trim_salts: int | str | None = "auto",
    hot_host_rows: int = FRONTIER_HOT_HOST_ROWS,
    auto_salts: int = FRONTIER_AUTO_SALTS,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
    broadcast_delays: bool = True,
) -> DataFrame:
    """schedule_frontier with PER-HOST politeness: fetch_offset_ms =
    slot × the host's own crawl delay (from parse_crawl_delays or any
    (host, delay_ms) table) instead of one global delay — the robots
    Crawl-delay directive actually honored per host.

    The delay table is per-host (small), so it broadcasts by default;
    the slot ranking is unchanged (same single narrow shuffle as
    schedule_frontier, including the trim_salts mega-host regime —
    the delay join composes with either plan)."""
    base = schedule_frontier(
        urls,
        n_fetchers=n_fetchers,
        delay_ms=0,  # offsets recomputed below from the joined delay
        host_budget=host_budget,
        trim_salts=trim_salts,
        hot_host_rows=hot_host_rows,
        auto_salts=auto_salts,
        url_col=url_col,
        host_col=host_col,
        priority_col=priority_col,
    ).drop("fetch_offset_ms")
    d = delays.select(host_col, "delay_ms")
    if broadcast_delays:
        d = F.broadcast(d)
    return base.join(d, host_col, "left").select(
        url_col,
        host_col,
        "fetcher_id",
        "slot",
        (
            F.col("slot")
            * F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
        ).cast("long").alias("fetch_offset_ms"),
        "keep",
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    body_col: str = "sitemap_xml",
    default_priority_micro: int = 500_000,
) -> DataFrame:
    """(host, url, lastmod, priority_micro) from sitemap XML bodies —
    the URL-discovery input that feeds the frontier. One row per
    <url> block; <loc> required (blocks without one are dropped),
    <lastmod> optional (empty string when absent), <priority>
    optional (0.0–1.0 decimal, scaled to exact integer micro-units by
    DIGIT manipulation, never float multiplication — '0.8' → 800000;
    absent/garbage → the sitemap default 0.5).

    Pure in-row expressions: `(?s)` regexps lift the blocks and
    fields, digit surgery builds the micro priority — no XML library,
    no Python. Not a general XML parser (sitemaps are a rigid,
    machine-generated format; entity edge cases are out of scope —
    documented honest ceiling). The output's priority_micro plugs
    straight into schedule_frontier's priority column."""
    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1)
    )
    def field(b: Column, tag: str) -> Column:
        return F.regexp_extract(b, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1)

    def micro(p: Column) -> Column:
        # '1' / '1.0' / '0.85' → integer micro-units via digit surgery:
        # int part × 1e6 + fraction padded/truncated to 6 digits
        ip = F.regexp_extract(p, r"^([0-9]+)", 1)
        fp = F.rpad(F.regexp_extract(p, r"^[0-9]+\.([0-9]+)$", 1), 6, "0")
        ok = p.rlike(r"^[0-9]+(\.[0-9]+)?$")
        return F.when(
            ok,
            ip.cast("long") * 1_000_000
            + F.coalesce(F.substring(fp, 1, 6).cast("long"), F.lit(0)),
        ).otherwise(F.lit(default_priority_micro))

    rows = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                field(b, "loc").alias("url"),
                field(b, "lastmod").alias("lastmod"),
                micro(field(b, "priority")).alias("priority_micro"),
            ),
        ),
        lambda r: F.length(r["url"]) > 0,
    )
    return sitemaps.select(host_col, F.explode(rows).alias("r")).select(
        host_col,
        F.col("r.url").alias("url"),
        F.col("r.lastmod").alias("lastmod"),
        F.col("r.priority_micro").alias("priority_micro"),
    )


def plan_retries(
    fetch_log: DataFrame,
    base_delay_ms: int = 1000,
    max_delay_ms: int = 60_000,
    max_attempts: int = 4,
    url_col: str = "url",
) -> DataFrame:
    """(url, attempts, last_status, verdict, retry_after_ms) from a
    fetch log of (url, attempt, status) rows — the feedback edge that
    closes the crawl loop (plan → fetch → retry plan):

      * verdict 'done'      — any attempt returned 2xx;
      * verdict 'permanent' — newest attempt is a non-retryable 4xx
        (404, 410, 403, 401 …; 408 and 429 stay retryable);
      * verdict 'exhausted' — attempts ≥ max_attempts, still failing;
      * verdict 'retry'     — transient failure (5xx / 429 / 408 /
        status 0 = network error), retry_after_ms = min(base · 2^n,
        max) truncated binary exponential backoff keyed on the number
        of FAILED attempts so far.

    retry_after_ms is NULL except for 'retry' rows (-1-style sentinels
    are for oracle outputs; this is a planning surface). One narrow
    groupBy(url) over status-code rows — page bytes never enter the
    log. The backoff is deterministic (no jitter) so replays and
    oracles agree; a fetcher fleet wanting jitter can salt on its own
    fetcher_id downstream."""
    per_url = fetch_log.groupBy(url_col).agg(
        F.count("*").cast("long").alias("attempts"),
        F.max(F.struct(F.col("attempt"), F.col("status")))["status"]
        .cast("long")
        .alias("last_status"),
        F.max(
            ((F.col("status") >= 200) & (F.col("status") < 300)).cast("int")
        ).alias("succeeded"),
    )
    retryable = (
        (F.col("last_status") >= 500)
        | F.col("last_status").isin(0, 408, 429)
    )
    verdict = (
        F.when(F.col("succeeded") == 1, F.lit("done"))
        .when(~retryable, F.lit("permanent"))
        .when(F.col("attempts") >= max_attempts, F.lit("exhausted"))
        .otherwise(F.lit("retry"))
    )
    backoff = F.least(
        F.lit(base_delay_ms)
        * F.pow(F.lit(2.0), F.col("attempts").cast("double")).cast("long"),
        F.lit(max_delay_ms),
    ).cast("long")
    return per_url.select(
        url_col,
        "attempts",
        "last_status",
        verdict.alias("verdict"),
        F.when(verdict == "retry", backoff)
        .otherwise(F.lit(None).cast("long"))
        .alias("retry_after_ms"),
    )
