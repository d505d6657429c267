"""End-to-end launch test for the crawl-frontier planner: package the
library, run jobs/frontier_job.py through actual `spark-submit
--py-files`, and verify the plan, the URL-gate rejections, and the
politeness invariants on the output parquet."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from tests.test_spark_submit import _zip_package


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_frontier_job_plan_and_gate(tmp_path):
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    inp = str(tmp_path / "urls.parquet")

    rows = []
    # 30 clean URLs over 3 hosts, priorities cycling 0..9
    for i in range(30):
        rows.append((f"https://h{i % 3}.example.com/p/{i}", i % 10))
    # 5 spam URLs the gate must reject before scheduling
    for i in range(5):
        rows.append((f"https://games.example.com/casino/poker/{i}", 99))
    # 4 robots-disallowed URLs on an otherwise-clean host
    for i in range(4):
        rows.append((f"https://h0.example.com/private/{i}", 50))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR, priority BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute(f"COPY t TO '{inp}' (FORMAT PARQUET)")
    robots = str(tmp_path / "robots.parquet")
    con.execute(
        "CREATE TABLE rb (host VARCHAR, robots_txt VARCHAR)"
    )
    con.execute(
        "INSERT INTO rb VALUES ('h0.example.com', "
        "'Sitemap: https://h0.example.com/sitemap.xml' || chr(10) "
        "|| 'User-agent: *' || chr(10) || 'Crawl-delay: 2' || chr(10) "
        "|| 'Disallow: /private')"
    )
    con.execute(f"COPY rb TO '{robots}' (FORMAT PARQUET)")
    # sitemap discovery: h1 publishes 3 new high-priority URLs
    sitemaps = str(tmp_path / "sitemaps.parquet")
    xml = "<urlset>" + "".join(
        f"<url><loc>https://h1.example.com/sm/{i}</loc>"
        "<priority>0.9</priority></url>"
        for i in range(3)
    ) + "</urlset>"
    con.execute("CREATE TABLE sm (host VARCHAR, sitemap_xml VARCHAR)")
    con.execute("INSERT INTO sm VALUES ('h1.example.com', ?)", [xml])
    con.execute(f"COPY sm TO '{sitemaps}' (FORMAT PARQUET)")
    # previous round's fetch log: two h2 URLs settled, one still flaky
    fetch_log = str(tmp_path / "fetch_log.parquet")
    con.execute("CREATE TABLE fl (url VARCHAR, attempt INT, status INT)")
    con.executemany(
        "INSERT INTO fl VALUES (?, ?, ?)",
        [
            ("https://h2.example.com/p/2", 1, 200),   # done
            ("https://h2.example.com/p/5", 1, 404),   # permanent
            ("https://h2.example.com/p/8", 1, 503),   # retry → stays
        ],
    )
    con.execute(f"COPY fl TO '{fetch_log}' (FORMAT PARQUET)")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "frontier_job.py"),
            "--input", inp,
            "--output", out_dir,
            "--n-fetchers", "8",
            "--host-budget", "7",
            "--robots", robots,
            "--sitemaps", sitemaps,
            "--fetch-log", fetch_log,
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["urls_in"] == 42  # 39 seeds + 3 sitemap discoveries
    assert summary["sitemap_discovered"] == 3
    assert summary["settled"] == 2  # h2's done + permanent URLs leave
    assert summary["url_rejected"] == 5  # the casino/poker URLs
    assert summary["robots_disallowed"] == 4  # h0's /private URLs
    assert summary["sitemap_urls_discovered"] == 1
    assert summary["planned"] == 31
    assert summary["hosts"] == 3
    # budget 7: h0 has 10 (3 over), h1 13 (6 over), h2 8 (1 over)
    assert summary["over_budget"] == 10
    # the transient failure stays scheduled AND carries its backoff
    retry = con.sql(
        f"SELECT url, verdict, retry_after_ms "
        f"FROM read_parquet('{out_dir}/retry_plan/*.parquet')"
    ).fetchall()
    assert retry == [("https://h2.example.com/p/8", "retry", 2000)]

    plan = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/plan/*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    cols = [d[0] for d in con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/plan/*/*.parquet', hive_partitioning=1) LIMIT 0"
    ).description]
    by = lambda r: dict(zip(cols, r))  # noqa: E731
    # host affinity: one fetcher per host
    fetchers = {}
    for r in map(by, plan):
        fetchers.setdefault(r["host"], set()).add(r["fetcher_id"])
    assert all(len(v) == 1 for v in fetchers.values())
    # slots are 0..9 within each host, keep=false exactly for slot >= 7;
    # h0 declared Crawl-delay: 2 → its offsets stretch to 2 s per slot,
    # the robots-silent hosts stay on the --delay-ms default
    for r in map(by, plan):
        assert r["keep"] == (r["slot"] < 7)
        per_slot = 2000 if r["host"] == "h0.example.com" else 1000
        assert r["fetch_offset_ms"] == r["slot"] * per_slot
        # 0.9-priority sitemap URLs outrank every 0-9 seed priority
        if "/sm/" in r["url"]:
            assert r["slot"] <= 2

    rejected = con.sql(
        f"SELECT url FROM read_parquet('{out_dir}/rejected/*.parquet')"
    ).fetchall()
    assert len(rejected) == 5
    assert all("casino" in u for (u,) in rejected)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_frontier_job_authority_priority(tmp_path):
    """--authority composes the quality priority and
    --min-authority-micro drops the blocklisted/low-authority host's
    URLs into rejected_authority/ — it literally loses its slots."""
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    inp = str(tmp_path / "urls.parquet")

    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR, priority BIGINT)")
    rows = []
    for i in range(10):
        rows.append((f"https://www.good.com/p/{i}", 0))
        rows.append((f"https://www.spamfarm.net/p/{i}", 99))  # low authority
        rows.append((f"https://www.fresh.org/p/{i}", 0))      # unknown domain
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute(f"COPY t TO '{inp}' (FORMAT PARQUET)")
    authority = str(tmp_path / "authority.parquet")
    con.execute("CREATE TABLE a (domain VARCHAR, rank_micro BIGINT)")
    con.executemany(
        "INSERT INTO a VALUES (?, ?)",
        [("good.com", 800_000_000_000), ("spamfarm.net", 1_000_000_000)],
    )
    con.execute(f"COPY a TO '{authority}' (FORMAT PARQUET)")
    dq = str(tmp_path / "dq.parquet")
    con.execute("CREATE TABLE q (domain VARCHAR, quality_micro BIGINT)")
    con.execute("INSERT INTO q VALUES ('good.com', 900000)")
    con.execute(f"COPY q TO '{dq}' (FORMAT PARQUET)")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pkg_zip,
            os.path.join(root, "jobs", "frontier_job.py"),
            "--input", inp,
            "--output", out_dir,
            "--host-budget", "5",
            "--authority", authority,
            "--domain-quality", dq,
            "--min-authority-micro", "10000",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # spamfarm's normalized authority = (2*1e9*1e6 + 8e11) // (2*8e11)
    # = 1250 micro < 10000 → all 10 URLs lose their slots
    assert summary["low_authority"] == 10
    assert summary["hosts"] == 2
    assert summary["planned"] == 20
    plan_hosts = {
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT host FROM read_parquet('{out_dir}/plan/*/*.parquet', hive_partitioning=1)"
        ).fetchall()
    }
    assert plan_hosts == {"www.good.com", "www.fresh.org"}
    rej = con.sql(
        f"SELECT DISTINCT domain FROM "
        f"read_parquet('{out_dir}/rejected_authority/*.parquet')"
    ).fetchall()
    assert rej == [("spamfarm.net",)]
    # composed priority: the measured-good domain outranks the unknown
    # one → identical path depths, but good.com slots fill first by
    # priority... (same-host ranking only) — assert the priorities did
    # land: good.com rows carry a strictly higher priority column than
    # fresh.org rows in the plan input (slot 0 of each host is its
    # best URL; cross-host comparison happens in the priority parquet)
    assert con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/plan/*/*.parquet', hive_partitioning=1) "
        f"WHERE NOT keep"
    ).fetchone()[0] == 10  # budget 5 over 10 URLs per surviving host


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_frontier_job_stream_mode_replay_idempotent(tmp_path):
    """--stream drains the discovery directory through the streaming
    gate; wiping ONLY the checkpoint and re-running replays the same
    micro-batch, and the per-batch overwrite discipline leaves every
    sink content-equal with the seen-set un-doubled."""
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    out_dir = str(tmp_path / "out")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR, priority BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [
            ("https://a.example.com/page", 3),
            ("https://a.example.com/page", 9),   # in-batch dup → max
            ("https://b.example.com/casino/poker", 99),  # spam → reject
            ("https://c.example.com/fresh", 1),
        ],
    )
    os.makedirs(in_dir, exist_ok=True)
    con.execute(f"COPY t TO '{in_dir}/drop0.parquet' (FORMAT PARQUET)")

    def run():
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pkg_zip,
                os.path.join(root, "jobs", "frontier_job.py"),
                "--input", in_dir,
                "--output", out_dir,
                "--stream",
                "--checkpoint", ckpt,
            ],
            capture_output=True,
            text=True,
            timeout=480,
            cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def snapshot():
        sched = sorted(
            con.sql(
                f"SELECT url, priority, batch_id FROM "
                f"read_parquet('{out_dir}/scheduled/*/*.parquet', "
                f"hive_partitioning=1)"
            ).fetchall()
        )
        rej = sorted(
            con.sql(
                f"SELECT url FROM read_parquet("
                f"'{out_dir}/rejected/*/*.parquet', hive_partitioning=1)"
            ).fetchall()
        )
        seen = sorted(
            con.sql(
                f"SELECT url, bucket, batch_id FROM read_parquet("
                f"'{out_dir}/seen/*/*/*.parquet', hive_partitioning=1)"
            ).fetchall()
        )
        return sched, rej, seen

    s1 = run()
    assert s1["mode"] == "stream"
    assert s1["scheduled"] == 2  # deduped good URL + fresh URL
    assert s1["rejected"] == 1
    assert s1["seen"] == 3
    snap1 = snapshot()
    assert {(u, p) for u, p, _ in snap1[0]} == {
        ("https://a.example.com/page", 9),
        ("https://c.example.com/fresh", 1),
    }

    # wipe ONLY the checkpoint → the same files replay as a fresh
    # batch 0; sinks must come back content-equal, seen-set unchanged
    shutil.rmtree(ckpt)
    s2 = run()
    assert snapshot() == snap1
    assert (s2["scheduled"], s2["rejected"], s2["seen"]) == (2, 1, 3)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_frontier_job_two_round_loop(tmp_path):
    """The closed crawl loop, CHAINED: round 1 plans (robots with a
    Sitemap: directive + sitemap bodies + URL gate); the fetch log is
    derived FROM round 1's plan parquet (the output schema feeds the
    input contract); round 2 settles fetched URLs, keeps the
    transient failure with its backoff, and re-plans the remainder."""
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "crh_spark.zip")
    _zip_package(pkg_zip)
    con = duckdb.connect()

    # --- round 1 inputs
    inp = str(tmp_path / "urls.parquet")
    con.execute("CREATE TABLE t (url VARCHAR, priority BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(f"https://h0.example.com/p/{i}", i) for i in range(12)],
    )
    con.execute(f"COPY t TO '{inp}' (FORMAT PARQUET)")
    robots = str(tmp_path / "robots.parquet")
    con.execute("CREATE TABLE rb (host VARCHAR, robots_txt VARCHAR)")
    con.execute(
        "INSERT INTO rb VALUES ('h0.example.com', "
        "'Sitemap: https://h0.example.com/sm.xml' || chr(10) || "
        "'User-agent:*' || chr(10) || 'Disallow: /p/11')"
    )
    con.execute(f"COPY rb TO '{robots}' (FORMAT PARQUET)")
    sitemaps = str(tmp_path / "sitemaps.parquet")
    con.execute("CREATE TABLE sm (host VARCHAR, sitemap_xml VARCHAR)")
    con.execute(
        "INSERT INTO sm VALUES ('h0.example.com', "
        "'<urlset><url><loc>https://h0.example.com/new/1</loc>"
        "<priority>0.9</priority></url></urlset>')"
    )
    con.execute(f"COPY sm TO '{sitemaps}' (FORMAT PARQUET)")

    def run(out, extra):
        proc = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", pkg_zip,
                os.path.join(root, "jobs", "frontier_job.py"),
                "--input", inp, "--output", out,
            ] + extra,
            capture_output=True, text=True, timeout=480, cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    out1 = str(tmp_path / "r1")
    s1 = run(out1, ["--robots", robots, "--sitemaps", sitemaps])
    assert s1["sitemap_urls_discovered"] == 1  # the robots Sitemap: line
    assert s1["sitemap_discovered"] == 1       # the XML body's URL
    assert s1["robots_disallowed"] == 1        # /p/11
    assert s1["planned"] == 12                 # 12 seeds + 1 new - 1 blocked

    # --- the fetch fleet "runs" round 1's plan: derive the log FROM it
    fetch_log = str(tmp_path / "fetch_log.parquet")
    con.execute(f"""
        COPY (
          SELECT url, 1 AS attempt,
                 CASE WHEN slot = 0 THEN 503        -- flaky best URL
                      WHEN slot = 1 THEN 404        -- gone
                      ELSE 200 END AS status
          FROM read_parquet('{out1}/plan/*/*.parquet', hive_partitioning=1)
          WHERE host = 'h0.example.com'
        ) TO '{fetch_log}' (FORMAT PARQUET)
    """)

    out2 = str(tmp_path / "r2")
    s2 = run(out2, ["--robots", robots, "--sitemaps", sitemaps,
                    "--fetch-log", fetch_log])
    # 10 × 200 done + 1 × 404 permanent leave; the 503 stays (retry)
    assert s2["settled"] == 11
    assert s2["planned"] == 1
    retry = con.sql(
        f"SELECT verdict, retry_after_ms FROM "
        f"read_parquet('{out2}/retry_plan/*.parquet')"
    ).fetchall()
    assert retry == [("retry", 2000)]
    # the survivor is exactly the flaky URL, re-planned at slot 0
    plan2 = con.sql(
        f"SELECT url, slot FROM read_parquet('{out2}/plan/*/*.parquet', "
        f"hive_partitioning=1)"
    ).fetchall()
    flaky = con.sql(
        f"SELECT url FROM read_parquet('{fetch_log}') WHERE status = 503"
    ).fetchone()[0]
    assert plan2 == [(flaky, 0)]
