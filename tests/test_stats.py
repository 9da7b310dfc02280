"""Stats/reader-family tests over crawl-shaped data (A1/A2/A4/A5/A6):
readdb -stats/-topN, DomainStatistics modes, CrawlCompletionStats,
ProtocolStatusStatistics."""

from __future__ import annotations

import math

from nutch_spark.operators.stats import (
    crawl_completion_stats,
    crawldb_stats,
    domain_statistics,
    protocol_status_stats,
    top_n,
)


def db(spark):
    rows = [
        ("http://a.sub.example.co.uk/1", "db_fetched", 0, 3600, 4.0, {"_pst_": "SUCCESS"}),
        ("http://a.sub.example.co.uk/2", "db_unfetched", 1, 3600, 2.0, {}),
        ("http://b.example.co.uk/1", "db_notmodified", 0, 7200, 1.0, {"_pst_": "NOTMODIFIED"}),
        ("http://c.other.com/1", "db_fetched", 2, 3600, 8.0, {"_pst_": "SUCCESS"}),
        ("http://c.other.com/2", "db_gone", 3, 3600, float("nan"), {"_pst_": "GONE"}),
    ]
    return spark.createDataFrame(
        rows,
        "url string, status string, retries int, fetch_interval int, "
        "score float, metadata map<string,string>",
    )


def test_crawldb_stats_sections(spark):
    s = crawldb_stats(db(spark))
    g = s["global"].collect()[0]
    assert g["total_urls"] == 5
    assert g["nan_score_count"] == 1
    assert g["max_score"] == 8.0 and g["min_score"] == 1.0
    assert g["min_fetch_interval"] == 3600 and g["max_fetch_interval"] == 7200
    assert len(g["score_quantiles"]) == 15  # db.stats.score.quantiles points
    status = {r["status"]: r["count"] for r in s["status"].collect()}
    assert status == {"db_fetched": 2, "db_unfetched": 1, "db_notmodified": 1, "db_gone": 1}
    retries = {r["retries"]: r["count"] for r in s["retries"].collect()}
    assert retries == {0: 2, 1: 1, 2: 1, 3: 1}


def test_crawldb_stats_sketch_sections(spark):
    """approx=True adds the two sketch sections; with cardinalities below
    the sketch parameters both are EXACT, so their values must equal the
    exact sections' — the estimator paths themselves are certified by the
    a1_stats_sketch / a3_kmv_hosts oracle rows and dp_kmv_distinct."""
    s = crawldb_stats(db(spark), approx=True, kmv_k=16, cm_width=1024)
    cm = {r["status"]: r["freq_est"] for r in s["status_cm"].collect()}
    # width 1024 >> 4 statuses: no collisions, count-min is exact here
    assert cm == {"db_fetched": 2, "db_unfetched": 1, "db_notmodified": 1, "db_gone": 1}
    kmv = s["hosts_kmv"].collect()[0]
    assert kmv["n_distinct_est"] == 3.0 and kmv["n_sketch"] == 3  # < k: exact


def test_hostdb_distinct_urls_kmv(spark):
    from nutch_spark.operators.hostdb import hostdb_distinct_urls

    got = {
        r["host"]: (r["n_distinct_est"], r["n_sketch"])
        for r in hostdb_distinct_urls(db(spark), k=16).collect()
    }
    assert got == {
        "a.sub.example.co.uk": (2.0, 2),
        "b.example.co.uk": (1.0, 1),
        "c.other.com": (2.0, 2),
    }


def test_top_n_with_threshold(spark):
    # Java parity (CrawlDbReader min-score prefilter uses `score < min`,
    # false for NaN; Float.compare ranks NaN greatest) — Spark's NaN
    # ordering matches both, so the NaN row passes the filter AND tops the
    # list. Documented, bit-for-bit consistent with the reference.
    got = [r["url"] for r in top_n(db(spark), 3, "score", min_value=2.0).collect()]
    assert math.isnan(db(spark).filter(f"url = '{got[0]}'").collect()[0]["score"])
    assert got[1:] == ["http://c.other.com/1", "http://a.sub.example.co.uk/1"]


def test_domain_statistics_modes(spark):
    by_host = {r["host"]: r["count"] for r in domain_statistics(db(spark), "host").collect()}
    assert by_host == {"a.sub.example.co.uk": 1, "b.example.co.uk": 1, "c.other.com": 1}
    # eTLD+1: example.co.uk groups the two uk hosts (public-suffix aware)
    by_domain = {r["domain"]: r["count"] for r in domain_statistics(db(spark), "domain").collect()}
    assert by_domain == {"example.co.uk": 2, "other.com": 1}
    by_tld = {r["tld"]: r["count"] for r in domain_statistics(db(spark), "tld").collect()}
    assert by_tld == {"uk": 2, "com": 1}


def test_completion_and_protocol_stats(spark):
    comp = {(r["host"], r["fetched_flag"]): r["count"]
            for r in crawl_completion_stats(db(spark)).collect()}
    assert comp[("a.sub.example.co.uk", "FETCHED")] == 1
    assert comp[("a.sub.example.co.uk", "UNFETCHED")] == 1
    assert comp[("c.other.com", "UNFETCHED")] == 1  # db_gone counts unfetched

    proto = {r["protocol_status"]: r["count"] for r in protocol_status_stats(db(spark)).collect()}
    assert proto == {"SUCCESS": 2, "NOTMODIFIED": 1, "GONE": 1, "UNFETCHED": 1}
