"""Domain-level link-graph authority: PageRank over (src, dst) domain
edges — the curation prior big crawls actually use (Common Crawl
publishes harmonic-centrality/PageRank domain ranks; pipelines join
them back as a quality feature next to the content gates).

Scale shape — the same discipline as the dedup connected-components
loop (operators/dedup.py):

  * the EDGE table is the big thing and it never moves after the one
    pre-shuffle: edges are repartitioned by src once, every iteration
    joins rank-by-src against it co-partitioned;
  * the RANK table is one row per node — millions of domains, not
    trillions of pages — so each iteration shuffles only narrow
    (node, rank) rows;
  * dangling mass (nodes with no out-edges) is ONE scalar aggregate
    per iteration, redistributed uniformly — the standard correction,
    without it rank mass leaks and the vector no longer sums to 1;
  * lineage is cut with localCheckpoint every few iterations —
    10+ chained joins otherwise build a plan Catalyst re-optimizes
    from scratch each action (the pointer-jumping lesson).

Floating-point: domain_pagerank's ranks are doubles; the loop is
deterministic given a fixed iteration count (sums are per-dst partial
aggregates — order differences live below the 1e-12 band the tests
assert at), but cross-engine float iteration is exactly the regime
the integer-micro discipline exists to avoid — so the ENGINE-EXACT
check lives in domain_pagerank_micro, the int64 twin whose identical
integer ops any engine replays (oracle pair `pagerank_micro`), with a
differential test tying the two loops together within 1e-6.

Reference counterpart: none (the reference serves single URLs); this
is the crawl-governance feature set's authority leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERATIONS = 10
# r9 second pass: cadence 2, not 4 — the cost of an off-checkpoint
# round is NOT the skipped barrier but the DEEPER PLAN the next
# materialization must optimize/AQE-replan (measured on the 9-node
# fixture, warm JVM, same session: every=4 10.6s, every=2 4.1s,
# every=1 4.6s for the micro twin; float twin 4.8/3.5/3.4). Depth-2
# keeps the replan bounded while still skipping half the barriers;
# at real graph sizes the extra narrow (node, rank) materialization
# per 4 rounds is standard Pregel practice.
_CHECKPOINT_EVERY = 2


def domain_pagerank(
    edges: DataFrame,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(domain, rank) for every node appearing in `edges` (either
    side); ranks sum to 1. Self-loops and duplicate edges are
    collapsed first (a site linking itself is not authority; a page
    linking twice is one edge at domain granularity)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("domain"))
        .unionByName(e.select(F.col("dst").alias("domain")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("domain", F.lit(0.0).alias("rank"))

    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    # contribution edges: (src, dst, 1/outdeg) — built once, reused
    # co-partitioned by src every iteration; lazy persist — the first
    # iteration's job materializes it (an eager count here would be
    # one more driver barrier for nothing)
    contrib = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("share"))
        .repartition("src")
        .persist()
    )

    ranks = nodes.select("domain", F.lit(1.0 / n).alias("rank")).persist()
    has_out = outdeg.select(F.col("src").alias("domain"))
    base = (1.0 - damping) / n
    stale: list[DataFrame] = []
    for i in range(iterations):
        # the dangling scalar rides the plan as a broadcast 1-row
        # frame (the micro twin's pattern): one materialization action
        # per iteration instead of a separate driver collect per round
        dang = F.broadcast(
            ranks.join(has_out, "domain", "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
            )
        )
        inflow = (
            contrib.join(
                ranks.withColumnRenamed("domain", "src"), "src"
            )
            .groupBy(F.col("dst").alias("domain"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("inflow"))
        )
        new_ranks = (
            nodes.join(inflow, "domain", "left")
            .crossJoin(dang)
            .select(
                "domain",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # one driver barrier per CHECKPOINT, not per round: off-
        # checkpoint rounds persist LAZILY (the next round's dangling
        # scan — or the checkpoint/final barrier — materializes the
        # cache), and superseded generations are released only after
        # a downstream materialization no longer needs them
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            new_ranks = new_ranks.localCheckpoint()  # eager barrier
            stale.append(ranks)
            for s in stale:
                s.unpersist()
            stale = []
        else:
            new_ranks = new_ranks.persist()
            stale.append(ranks)
        ranks = new_ranks
    ranks.count()  # materialize the tail rounds before releasing them
    for s in stale:
        s.unpersist()
    nodes.unpersist()
    contrib.unpersist()
    return ranks


PAGERANK_MICRO_SCALE = 10**12


def domain_pagerank_micro(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = PAGERANK_MICRO_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(domain, rank_micro) — the INTEGER twin of domain_pagerank:
    every iteration replays the identical order-independent int64 ops
    in any engine, so the float-iteration objection (module docstring)
    does not apply and the loop is DuckDB-oracle-able at a fixed
    iteration count:

      share(e)   = rank_micro(src) div outdeg(src)        [int div]
      inflow(d)  = Σ share(e) over in-edges                [exact sum]
      dangling   = Σ rank_micro over no-out-edge nodes     [1 scalar]
      rank'      = ((100−dp)·scale) div (100·n)
                   + (dp · (inflow + dangling div n)) div 100

    scale=10^12 keeps the truncation loss of the divs below 1e-6 of
    the total mass per iteration (differential-tested against the
    float loop). Same physical shape as domain_pagerank: edges
    pre-shuffled by src once, narrow (node, rank) iterations, one
    integer scalar per round, checkpointed lineage."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("domain"))
        .unionByName(e.select(F.col("dst").alias("domain")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("domain", F.lit(0).cast("long").alias("rank_micro"))

    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    # lazy persist — the first iteration materializes it (the former
    # eager count was one more driver barrier for nothing)
    ed = e.join(outdeg, "src").repartition("src").persist()

    base = ((100 - damping_pct) * scale) // (100 * n)
    ranks = nodes.select(
        "domain", F.lit(scale // n).cast("long").alias("rank_micro")
    ).persist()
    has_out = outdeg.select(F.col("src").alias("domain"))
    stale: list[DataFrame] = []
    for i in range(iterations):
        # the dangling scalar stays IN the plan as a broadcast 1-row
        # frame — one action per iteration (the persist/checkpoint
        # materialization), not a separate driver collect per round
        dang = F.broadcast(
            ranks.join(has_out, "domain", "left_anti").agg(
                F.coalesce(F.sum("rank_micro"), F.lit(0))
                .cast("long")
                .alias("dang")
            )
        )
        inflow = (
            ed.join(ranks.withColumnRenamed("domain", "src"), "src")
            .groupBy(F.col("dst").alias("domain"))
            .agg(
                F.sum(
                    F.expr("rank_micro div outdeg")
                ).cast("long").alias("inflow")
            )
        )
        new_ranks = (
            nodes.join(inflow, "domain", "left")
            .crossJoin(dang)
            .select(
                "domain",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * (coalesce(inflow, 0)"
                        f" + dang div {n})) div 100"
                    ).cast("long")
                ).alias("rank_micro"),
            )
        )
        # same barrier discipline as the float loop: lazy persist on
        # off-checkpoint rounds, release superseded generations only
        # after a downstream materialization
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            new_ranks = new_ranks.localCheckpoint()  # eager barrier
            stale.append(ranks)
            for s in stale:
                s.unpersist()
            stale = []
        else:
            new_ranks = new_ranks.persist()
            stale.append(ranks)
        ranks = new_ranks
    ranks.count()  # materialize the tail rounds before releasing them
    for s in stale:
        s.unpersist()
    nodes.unpersist()
    ed.unpersist()
    return ranks


def extract_outlinks(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """(src, dst) domain-level link edges harvested from raw HTML —
    the input domain_pagerank needs, extracted from the corpus the
    engine already scans: absolute http(s) hrefs lifted with one
    regexp_extract_all, reduced to their hosts, self-domain edges and
    duplicates collapsed in-row BEFORE the explode (array_distinct on
    the per-doc host list), then one distinct over narrow (src, dst)
    rows. Relative links resolve to the source domain and carry no
    cross-domain authority, so they are skipped by construction.

    Scale shape: the HTML is read once in the same scan other per-doc
    operators ride; only (src, dst) string pairs survive the explode.
    Pure Column expressions — no parser, no Python.

    Hosts are DOMAIN-normalized on both sides: lowercased (hostnames
    are case-insensitive — 'Example.COM' and 'example.com' must be one
    PageRank node, and a case-differing self-link must not survive the
    self-edge filter), userinfo ('user@') and port (':8080') stripped
    (authority at domain granularity, not endpoint granularity). The
    scheme match is case-insensitive ('HTTPS://...' links count)."""
    hrefs = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"""(?i)href\s*=\s*["'](https?://[^"'\s>]+)"""),
        F.lit(1),
    )
    dst_hosts = F.array_distinct(
        F.transform(
            hrefs,
            lambda u: F.lower(
                F.regexp_extract(
                    u, r"(?i)^https?://(?:[^/?#@]*@)?([^/?#:]+)", 1
                )
            ),
        )
    )
    src = F.lower(F.col(host_col))
    return (
        docs.select(
            src.alias("src"),
            F.explode(
                F.filter(dst_hosts, lambda h: (F.length(h) > 0) & (h != src))
            ).alias("dst"),
        )
        .distinct()
    )
