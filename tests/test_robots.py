"""Robots policy tests (P4): parsing, agent groups, longest-match verdicts,
crawl delays."""

from __future__ import annotations

from nutch_spark.operators.robots import crawl_delays, filter_allowed, parse_robots

ROBOTS = """# example robots
User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 2

User-agent: nutch
Disallow: /nutch-only/
Crawl-delay: 7
"""


def robots_df(spark):
    return spark.createDataFrame([("a.com", ROBOTS)], "host string, content string")


def test_parse_robots_groups(spark):
    rules = parse_robots(robots_df(spark)).collect()
    got = {(r["agent"], r["rule_type"], r["prefix"]) for r in rules}
    assert got == {
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/public/"),
        ("nutch", "disallow", "/nutch-only/"),
    }


def test_crawl_delays(spark):
    d = {(r["host"], r["agent"]): r["crawl_delay_s"] for r in crawl_delays(robots_df(spark)).collect()}
    assert d == {("a.com", "*"): 2.0, ("a.com", "nutch"): 7.0}


def test_filter_allowed_longest_match(spark):
    rules = parse_robots(robots_df(spark))
    fl = spark.createDataFrame(
        [
            ("http://a.com/ok",),                      # no rule → allowed
            ("http://a.com/private/x",),               # disallow /private/
            ("http://a.com/private/public/x",),        # longer allow wins
            ("http://a.com/nutch-only/x",),            # nutch-agent rule
            ("http://other.com/private/x",),           # no robots for host
        ],
        "url string",
    )
    star = {r["url"] for r in filter_allowed(fl, rules, agent="*").collect()}
    assert star == {
        "http://a.com/ok",
        "http://a.com/private/public/x",
        "http://a.com/nutch-only/x",   # the nutch group does not bind '*'
        "http://other.com/private/x",
    }

    nutch = {r["url"] for r in filter_allowed(fl, rules, agent="nutch").collect()}
    assert "http://a.com/nutch-only/x" not in nutch          # agent rule applies
    # crawler-commons group resolution: a.com HAS a nutch group, so the '*'
    # group is ignored entirely for agent nutch — /private/* has no matching
    # rule in the nutch group and is therefore allowed
    assert "http://a.com/private/public/x" in nutch
    assert "http://a.com/private/x" in nutch
    assert "http://other.com/private/x" in nutch


def test_robots_sitemaps_and_index_expansion(spark):
    from nutch_spark.operators.robots import robots_sitemaps
    from nutch_spark.sources.exports import expand_sitemap_index

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\nSitemap: http://a.com/s.xml\n"
                      "sitemap: http://a.com/s2.xml\nSitemap: http://a.com/s.xml"),
            ("b.com", "User-agent: *\nAllow: /"),
        ],
        "host string, content string",
    )
    got = {(r["host"], r["sitemap_url"]) for r in robots_sitemaps(robots).collect()}
    assert got == {("a.com", "http://a.com/s.xml"), ("a.com", "http://a.com/s2.xml")}

    idx = spark.createDataFrame(
        [("<sitemapindex><sitemap><loc>http://a.com/p1.xml</loc></sitemap>"
          "<sitemap><loc> http://a.com/p2.xml </loc></sitemap></sitemapindex>",)],
        "content string",
    )
    kids = {r["sitemap_url"] for r in expand_sitemap_index(idx).collect()}
    assert kids == {"http://a.com/p1.xml", "http://a.com/p2.xml"}


def test_robots_wildcard_and_anchor_rules(spark):
    # REP wildcard extensions: '*' spans, trailing '$' anchors. A *.pdf$
    # disallow blocks pdfs anywhere in the path; /private*/x blocks across
    # the wildcard span; the anchor does NOT block a longer path.
    from nutch_spark.operators.robots import filter_allowed, parse_robots

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /private*/x\nAllow: /")],
        "host string, content string",
    )
    rules = parse_robots(robots)
    fl = spark.createDataFrame(
        [
            ("http://h.com/a/doc.pdf",),        # blocked by /*.pdf$
            ("http://h.com/a/doc.pdf.html",),   # NOT blocked ($ anchor)
            ("http://h.com/private123/x",),     # blocked by /private*/x
            ("http://h.com/private123/y",),     # allowed
            ("http://h.com/ok",),
        ],
        "url string",
    )
    got = sorted(r["url"] for r in filter_allowed(fl, rules).collect())
    assert got == [
        "http://h.com/a/doc.pdf.html",
        "http://h.com/ok",
        "http://h.com/private123/y",
    ]


def test_apply_robots_delays(spark):
    from nutch_spark.operators.robots import apply_robots_delays, crawl_delays

    robots = spark.createDataFrame(
        [
            ("slow.com", "User-agent: *\nCrawl-delay: 7\nUser-agent: nutch\nCrawl-delay: 2"),
            ("hostile.com", "User-agent: *\nCrawl-delay: 9999"),
        ],
        "host string, content string",
    )
    delays = crawl_delays(robots)
    fl = spark.createDataFrame(
        [("http://slow.com/a",), ("http://hostile.com/b",), ("http://free.com/c",)],
        "url string",
    )
    out = {r["url"]: r["metadata"] for r in apply_robots_delays(fl, delays, agent="nutch").collect()}
    assert out["http://slow.com/a"]["_variableFetchDelay_"] == "2000"  # exact agent wins
    assert out["http://hostile.com/b"]["_variableFetchDelay_"] == "30000"  # capped
    assert "_variableFetchDelay_" not in out["http://free.com/c"]


def test_apply_robots_delays_exclusive_group_and_restamp(spark):
    from pyspark.sql import functions as F

    from nutch_spark.operators.robots import (
        apply_robots_delays,
        crawl_delays,
        parse_robots,
    )

    # exempt.com has an exact nutch group WITHOUT a delay → '*' delay must
    # not throttle nutch when groups are provided
    robots = spark.createDataFrame(
        [("exempt.com", "User-agent: nutch\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 10")],
        "host string, content string",
    )
    delays, groups = crawl_delays(robots), parse_robots(robots)
    fl = spark.createDataFrame([("http://exempt.com/a",)], "url string")
    out = apply_robots_delays(fl, delays, agent="nutch", groups=groups).first()
    assert "_variableFetchDelay_" not in out["metadata"]
    # re-stamping over existing metadata must not raise DUPLICATED_MAP_KEY
    pre = fl.withColumn(
        "metadata",
        F.create_map(F.lit("_variableFetchDelay_"), F.lit("1")),
    )
    out2 = apply_robots_delays(pre, delays, agent="*").first()
    assert out2["metadata"]["_variableFetchDelay_"] == "10000"


def test_fetch_with_robots_end_to_end(spark):
    """P4 wired into P1 (FetcherThread.java:380-400): robots.txt fetched
    once per host through the harness, forbidden urls emitted as
    fetch_gone/_robots_denied_, Crawl-delay stamped, allowed pages fetched."""
    import functools
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from nutch_spark.operators.fetcher import http_fetch_fn
    from nutch_spark.operators.robots import fetch_with_robots, robots_sitemaps

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/robots.txt":
                body = (
                    b"User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
                    b"Sitemap: http://x.example.com/sitemap.xml\n"
                )
            elif self.path.startswith("/private/"):
                body = b"<html><title>secret</title></html>"
            else:
                body = b"<html><head><title>open</title></head><body>ok</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        fl = spark.createDataFrame(
            [(f"{base}/open.html",), (f"{base}/private/x.html",)], "url string"
        )
        log, robots_log = fetch_with_robots(
            fl, fetch_fn=functools.partial(http_fetch_fn, timeout_s=5.0)
        )
        rows = {r["url"]: r for r in log.collect()}
        assert rows[f"{base}/open.html"]["status"] == "fetch_success"
        denied = rows[f"{base}/private/x.html"]
        assert denied["status"] == "fetch_gone"
        assert denied["metadata"]["_robots_denied_"] == "1"
        # the robots round fetched exactly one robots.txt for the host
        from pyspark.sql import functions as F

        r_rows = robots_log.collect()
        assert len(r_rows) == 1
        assert r_rows[0]["url"] == f"{base}/robots.txt"
        assert b"Crawl-delay: 2" in r_rows[0]["content"]

        content = robots_log.filter(F.col("status") == "fetch_success").select(
            F.lit("127.0.0.1").alias("host"), "content"
        )
        sm = robots_sitemaps(content).collect()
        assert sm[0]["sitemap_url"] == "http://x.example.com/sitemap.xml"
    finally:
        srv.shutdown()
        srv.server_close()


def test_parse_robots_accepts_binary_content(spark):
    # robots bodies arrive as raw fetch bytes (FETCH_SCHEMA binary) —
    # the parsers decode utf-8-replace at the boundary, surviving stray
    # non-UTF-8 bytes without failing the round
    from pyspark.sql import functions as F

    from nutch_spark.operators.robots import crawl_delays, parse_robots

    rb = spark.createDataFrame(
        [("h1", bytearray(b"User-agent: *\nDisallow: /private\nCrawl-delay: 3\n\xff"))],
        "host string, content binary",
    )
    rules = parse_robots(rb).collect()
    assert [(r["agent"], r["rule_type"], r["prefix"]) for r in rules] == [
        ("*", "disallow", "/private")
    ]
    (d,) = crawl_delays(rb).collect()
    assert d["crawl_delay_s"] == 3.0
