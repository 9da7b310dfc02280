"""Tests for WARC/CommonCrawl exports (S7/S8), sitemap source (S10),
orphan marking (D8), similarity scoring (D5), and the indexing join (J3) +
hostdb (J6) operators."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.operators.hostdb import string_field_counts, update_hostdb
from nutch_spark.operators.indexing import cleaning_targets, indexing_join
from nutch_spark.operators.orphan import mark_orphans, tf_cosine_to_goldstandard
from nutch_spark.sources.exports import commoncrawl_dump, parse_sitemap, warc_records

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
FETCH_SCHEMA = (
    "url string, status string, fetch_time timestamp, content string, "
    "content_type string, signature binary, metadata map<string,string>"
)


def test_warc_and_commoncrawl(spark):
    log = spark.createDataFrame(
        [
            ("http://a.com/1", "fetch_success", T0, "<html><title>t1</title>x</html>",
             "text/html", b"s", {}),
            ("http://a.com/2", "fetch_gone", T0, None, None, None, {}),
        ],
        FETCH_SCHEMA,
    )
    recs = warc_records(log).collect()
    assert len(recs) == 1  # only successes exported
    rec = recs[0]["value"]
    assert rec.startswith("WARC/1.0\r\n")
    assert "WARC-Target-URI: http://a.com/1\r\n" in rec
    assert "WARC-Date: 2026-01-01T12:00:00Z" in rec
    assert f"Content-Length: {len('<html><title>t1</title>x</html>')}" in rec

    pd = spark.createDataFrame(
        [("http://a.com/1", "t1", "x")], "url string, title string, parse_text string"
    )
    cc = commoncrawl_dump(log, pd).collect()
    assert len(cc) == 1
    assert cc[0]["timestamp"] == "20260101120000"
    assert cc[0]["title"] == "t1" and cc[0]["text"] == "x"


def test_parse_sitemap(spark):
    xml = """<?xml version="1.0"?><urlset>
      <url><loc>http://a.com/p1</loc><changefreq>daily</changefreq><priority>0.8</priority></url>
      <url><loc> http://a.com/p2 </loc></url>
      <url><priority>0.1</priority></url>
    </urlset>"""
    df = spark.createDataFrame([(xml,)], "content string")
    out = {r["url"]: r["metadata"] for r in parse_sitemap(df).collect()}
    assert out["http://a.com/p1"] == {"sitemap.changefreq": "daily", "sitemap.priority": "0.8"}
    assert out["http://a.com/p2"] == {}  # no optional fields
    assert len(out) == 2  # entry without <loc> dropped


def test_mark_orphans(spark):
    db = spark.createDataFrame(
        [
            ("http://linked.com/", "db_fetched"),
            ("http://orphan.com/", "db_fetched"),
            ("http://new.com/", "db_unfetched"),  # protected
        ],
        "url string, status string",
    )
    linkdb = spark.createDataFrame([("http://linked.com/",)], "to_url string")
    out = {r["url"]: r["status"] for r in mark_orphans(db, linkdb).collect()}
    assert out["http://orphan.com/"] == "db_orphan"
    assert out["http://linked.com/"] == "db_fetched"
    assert out["http://new.com/"] == "db_unfetched"

    purged = mark_orphans(db, linkdb, purge=True)
    assert {r["url"] for r in purged.collect()} == {"http://linked.com/", "http://new.com/"}


def test_similarity_scoring(spark):
    docs = spark.createDataFrame(
        [(1, "spark query engine"), (2, "cats and dogs"), (3, "spark spark spark")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["similarity_score"] for r in
           tf_cosine_to_goldstandard(docs, ["spark", "query", "engine"]).collect()}
    assert abs(out[1] - 1.0) < 1e-9          # identical token multiset
    assert out[2] == 0.0                     # disjoint
    assert 0 < out[3] < 1                    # partial overlap


def test_indexing_join_actions_and_fields(spark):
    db = spark.createDataFrame(
        [
            ("http://add.com/", "db_fetched", 4.0, b"sig"),
            ("http://gone.com/", "db_gone", 1.0, None),
            ("http://dup.com/", "db_duplicate", 1.0, b"x"),
        ],
        "url string, status string, score float, signature binary",
    )
    fl = spark.createDataFrame(
        [
            ("http://add.com/", "fetch_success", T0, b"sig"),
            ("http://gone.com/", "fetch_gone", T0, None),
            ("http://dup.com/", "fetch_success", T0, b"x"),
        ],
        "url string, status string, fetch_time timestamp, signature binary",
    )
    pd = spark.createDataFrame(
        [
            ("http://add.com/", "A Title That Is Long", {"Content-Type": "text/html"},
             {"robots": "index,follow"}, "seg1"),
            ("http://gone.com/", "", {}, {}, "seg1"),
            ("http://dup.com/", "t", {}, {"robots": "noindex"}, "seg1"),
        ],
        "url string, title string, content_meta map<string,string>, "
        "parse_meta map<string,string>, segment_id string",
    )
    pt = spark.createDataFrame(
        [("http://add.com/", "body text")], "url string, text string"
    )
    out = {r["url"]: r for r in indexing_join(db, fl, pd, pt).collect()}
    assert out["http://add.com/"]["action"] == "ADD"
    assert out["http://add.com/"]["host"] == "add.com"
    assert out["http://add.com/"]["boost"] == 2.0          # pow(4, 0.5)
    assert out["http://gone.com/"]["action"] == "DELETE"   # db_gone
    assert out["http://dup.com/"]["action"] == "DELETE"    # robots noindex wins

    assert {r["url"] for r in cleaning_targets(db).collect()} == {
        "http://gone.com/", "http://dup.com/"
    }


def test_update_hostdb(spark):
    db = spark.createDataFrame(
        [
            ("http://h1.com/a", "db_fetched", 2.0, {"rs": "100"}),
            ("http://h1.com/b", "db_unfetched", 4.0, {"rs": "300"}),
            ("http://h2.com/a", "db_gone", 1.0, {}),
        ],
        "url string, status string, score float, metadata map<string,string>",
    )
    cfg = NutchConfig(hostdb_numeric_fields=("rs",), hostdb_percentiles=(50,))
    out = {r["host"]: r for r in update_hostdb(db, cfg=cfg).collect()}
    assert out["h1.com"]["fetched"] == 1 and out["h1.com"]["unfetched"] == 1
    assert out["h2.com"]["gone"] == 1
    assert abs(out["h1.com"]["score"] - 3.0) < 1e-6
    assert out["h1.com"]["min.rs"] == 100.0 and out["h1.com"]["max.rs"] == 300.0

    counts = string_field_counts(db, "rs").collect()
    assert {(r["host"], r["value"], r["count"]) for r in counts} == {
        ("h1.com", "100", 1), ("h1.com", "300", 1)
    }


def test_depth_scoring(spark):
    from nutch_spark.operators.depth import propagate_depth, seed_depth

    seeds = spark.createDataFrame(
        [("http://s.com/", {"k": "v"}), ("http://deep.com/", {"_maxdepth_": "5"})],
        "url string, metadata map<string,string>",
    )
    seeded = {r["url"]: r["metadata"] for r in seed_depth(seeds, max_depth=2).collect()}
    assert seeded["http://s.com/"] == {"k": "v", "_maxdepth_": "2", "_depth_": "0"}
    assert seeded["http://deep.com/"]["_maxdepth_"] == "5"  # per-seed override kept

    parents = spark.createDataFrame(
        [
            ("http://s.com/", {"_depth_": "1", "_maxdepth_": "2"}),
            ("http://ok.com/", {"_depth_": "0", "_maxdepth_": "2"}),
        ],
        "url string, metadata map<string,string>",
    )
    outlinks = spark.createDataFrame(
        [
            ("http://s.com/", "http://child-at-limit.com/"),   # depth 2 == max: kept
            ("http://ok.com/", "http://child-ok.com/"),        # depth 1: kept
            ("http://unknown.com/", "http://orphan-child.com/"),  # parent absent: depth 1
        ],
        "from_url string, to_url string",
    )
    out = {r["to_url"]: r["metadata"] for r in propagate_depth(outlinks, parents, default_max_depth=2).collect()}
    assert out["http://child-at-limit.com/"]["_depth_"] == "2"
    assert out["http://child-ok.com/"]["_depth_"] == "1"
    assert out["http://orphan-child.com/"]["_depth_"] == "1"

    # one more hop from the at-limit child must be dropped
    deeper = spark.createDataFrame(
        [("http://child-at-limit.com/", "http://too-deep.com/")],
        "from_url string, to_url string",
    )
    parents2 = spark.createDataFrame(
        [("http://child-at-limit.com/", {"_depth_": "2", "_maxdepth_": "2"})],
        "url string, metadata map<string,string>",
    )
    assert propagate_depth(deeper, parents2, default_max_depth=2).count() == 0


def test_index_filter_plugins_extended(spark):
    from nutch_spark.operators.index_filters import (
        anchor_fields,
        jexl_doc_filter,
        replace_fields,
        subcollection_field,
        tld_field,
    )

    doc = spark.createDataFrame(
        [
            ("http://docs.site.org/a", "Hello World", 5.0),
            ("http://blog.site.com/b", "Other Text", 1.0),
        ],
        "url string, title string, boost double",
    )
    linkdb = spark.createDataFrame(
        [("http://docs.site.org/a", ["click", "here", "click"])],
        "url string, anchors array<string>",
    )
    out = anchor_fields(doc, linkdb)
    rows = {r["url"]: r for r in out.collect()}
    assert sorted(rows["http://docs.site.org/a"]["anchors"]) == ["click", "here"]
    assert rows["http://blog.site.com/b"]["anchors"] == []

    rep = replace_fields(doc, [("title", "Hello", "Goodbye"), ("title", "Goodbye World", "GW")])
    assert rep.filter(F.col("url").endswith("/a")).first()["title"] == "GW"

    kept = jexl_doc_filter(doc, "boost > 2.0")
    assert [r["url"] for r in kept.collect()] == ["http://docs.site.org/a"]

    sub = subcollection_field(doc, {"docs": ("http://docs.",), "all": ("http://",)})
    got = {r["url"]: list(r["subcollections"]) for r in sub.collect()}
    assert got["http://docs.site.org/a"] == ["all", "docs"]
    assert got["http://blog.site.com/b"] == ["all"]

    t = {r["url"]: r["tld"] for r in tld_field(doc).collect()}
    assert t["http://docs.site.org/a"] == "org"
    assert t["http://blog.site.com/b"] == "com"


def test_geoip_bucketed_range_join(spark):
    from nutch_spark.operators.index_filters import geoip_fields

    doc = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.100.3.4"), (3, "10.250.0.1"), (4, "10.63.255.255")],
        "id long, ip string",
    )
    ranges = [("10.0.0.0", "10.63.255.255", "US"), ("10.64.0.0", "10.127.255.255", "DE")]
    out = {r["id"]: r["country"] for r in geoip_fields(doc, ranges).collect()}
    assert out == {1: "US", 2: "DE", 3: None, 4: "US"}


def test_geoip_malformed_ips_degrade_to_null(spark):
    from nutch_spark.operators.index_filters import geoip_fields

    doc = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.1.2"), (3, "bad-ip"), (4, None), (5, "10.0.0.1.9")],
        "id long, ip string",
    )
    ranges = [("10.0.0.0", "10.63.255.255", "US")]
    out = {r["id"]: r["country"] for r in geoip_fields(doc, ranges).collect()}
    assert out == {1: "US", 2: None, 3: None, 4: None, 5: None}


def test_rel_tag_and_cc_license_fields(spark):
    from pyspark.sql import functions as F

    from nutch_spark.operators.index_filters import cc_license_fields, rel_tag_field

    html_tags = (
        '<html><a rel="tag" href="http://ex.com/tags/big%20data">x</a>'
        '<a href="http://ex.com/tags/spark" rel="tag">y</a>'
        '<a rel="tag" href="http://ex.com/tags/spark">dup</a>'
        '<a href="http://ex.com/notag">plain</a></html>'
    )
    html_cc_rel = (
        '<html><a rel="license" href="http://creativecommons.org/licenses/by/4.0/">cc</a></html>'
    )
    html_cc_rdf = (
        "<html><!-- <rdf:RDF xmlns:cc='x'><license rdf:resource="
        '"http://creativecommons.org/licenses/by-sa/2.0/"/></rdf:RDF> -->'
        '<a rel="license" href="http://creativecommons.org/licenses/by/4.0/">cc</a></html>'
    )
    html_cc_plain = (
        '<html><a href="http://creativecommons.org/licenses/by-nc/3.0/">terms</a></html>'
    )
    df = spark.createDataFrame(
        [(1, html_tags), (2, html_cc_rel), (3, html_cc_rdf), (4, html_cc_plain), (5, "<html>none</html>")],
        "id long, content string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id", rel_tag_field("content").alias("tags"), *cc_license_fields("content")
        ).collect()
    }
    assert sorted(out[1]["tags"]) == ["big data", "spark"]  # decoded + distinct
    assert out[2]["license_url"] == "http://creativecommons.org/licenses/by/4.0/"
    assert out[2]["license_location"] == "rel"
    # RDF outranks the rel anchor (CCParseFilter priority)
    assert out[3]["license_url"] == "http://creativecommons.org/licenses/by-sa/2.0/"
    assert out[3]["license_location"] == "rdf"
    assert out[4]["license_location"] == "a"
    assert out[5]["license_url"] is None and out[5]["license_location"] is None


def test_indexing_binary_content_base64(spark):
    """Port of TestIndexerMapReduce.testBinaryContentBase64 (reference
    src/test/org/apache/nutch/indexer/TestIndexerMapReduce.java:159-205):
    with indexer.add.binary.content + indexer.binary.base64, the document
    carries the fetched content base64-encoded and it round-trips."""
    import base64
    from dataclasses import replace

    from pyspark.sql import functions as F

    from nutch_spark.config import DEFAULT
    from nutch_spark.operators.indexing import indexing_join

    html = "<html><head><title>t</title></head><body>content çeský</body></html>"
    url = "http://nutch.apache.org/"
    fetch_log = spark.createDataFrame(
        [(url, "fetch_success", None, None, html)],
        "url string, status string, fetch_time timestamp, signature binary, "
        "content string",
    )
    parse_data = spark.createDataFrame(
        [(url, "s1", "t", [], {}, {})],
        "url string, segment_id string, title string, "
        "outlinks array<struct<to_url:string,anchor:string>>, "
        "content_meta map<string,string>, parse_meta map<string,string>",
    )
    parse_text = spark.createDataFrame(
        [(url, "s1", "content")], "url string, segment_id string, text string"
    )
    db = spark.createDataFrame(
        [(url, "db_fetched", 1.0, None)],
        "url string, status string, score float, signature binary",
    ).withColumn("score", F.col("score").cast("float"))

    cfg = replace(
        DEFAULT, indexer_add_binary_content=True, indexer_binary_base64=True
    )
    doc = indexing_join(db, fetch_log, parse_data, parse_text, None, cfg=cfg).collect()[0]
    assert base64.b64decode(doc["binary_content"]).decode("utf-8") == html

    raw_cfg = replace(DEFAULT, indexer_add_binary_content=True)
    doc2 = indexing_join(db, fetch_log, parse_data, parse_text, None, cfg=raw_cfg).collect()[0]
    assert doc2["binary_content"] == html

    # off by default: no binary_content column
    doc3 = indexing_join(db, fetch_log, parse_data, parse_text, None).collect()[0]
    assert "binary_content" not in doc3.asDict()
