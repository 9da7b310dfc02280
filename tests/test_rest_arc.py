"""S11 REST read shim + S9 ARC import tests (rows-only — both map thin
plumbing onto already-oracle-checked operators)."""

from __future__ import annotations

import datetime
import gzip

import pytest

from nutch_spark.sources.arc import read_arc
from nutch_spark.sources.rest import NutchReadApi

NOW = datetime.datetime(2026, 1, 1)

DB_SCHEMA = (
    "url string, status string, fetch_time timestamp, retries int, "
    "fetch_interval int, score float, signature binary, modified_time timestamp, "
    "metadata map<string,string>"
)


@pytest.fixture()
def api(spark):
    db = spark.createDataFrame(
        [
            (f"http://h{i % 3}.com/{i}", "db_fetched", NOW, 0, 1000, float(i), None, NOW, {})
            for i in range(10)
        ],
        DB_SCHEMA,
    )
    linkdb = spark.createDataFrame(
        [(f"http://t.com/{i}", [{"from_url": "http://s.com/", "anchor": "a"}]) for i in range(5)],
        "to_url string, inlinks array<struct<from_url string, anchor string>>",
    )
    return NutchReadApi(crawldb=db, fetchdb=db, linkdb=linkdb, nodedb=None)


def test_db_crawldb_stats_url_topn_dump(api):
    stats = api.db_crawldb({"type": "stats", "crawlId": "c1"})
    assert stats["global"][0]["total_urls"] == 10
    assert {r["status"]: r["count"] for r in stats["status"]} == {"db_fetched": 10}

    one = api.db_crawldb({"type": "url", "crawlId": "c1", "args": {"url": "http://h1.com/1"}})
    assert one["score"] == 1.0

    top = api.db_crawldb({"type": "topN", "crawlId": "c1", "args": {"topN": "3"}})
    assert [r["url"] for r in top] == ["http://h0.com/9", "http://h2.com/8", "http://h1.com/7"]

    dump = api.db_crawldb({"type": "dump", "crawlId": "c1", "args": {"limit": "4"}})
    assert len(dump) == 4

    with pytest.raises(ValueError):
        api.db_crawldb({"type": "nope", "crawlId": "c1"})


def test_db_fetchdb_range(api):
    all_rows = api.db_fetchdb()
    assert len(all_rows) == 10
    window = api.db_fetchdb(from_=2, to=5)
    assert len(window) == 4
    assert window == all_rows[2:6]


def test_link_read_and_schema(api):
    rows = api.link_read(start=1, end=3)
    assert [r["to_url"] for r in rows] == [f"http://t.com/{i}" for i in (1, 2, 3)]
    assert api.link_schema()["to_url"] == "string"


def test_seed_lists(api):
    assert api.get_seed_lists() == {}
    api.create_seed_list("s1", ["http://a.com/", "http://b.com/"])
    assert api.get_seed_lists()["s1"] == ["http://a.com/", "http://b.com/"]


# --- ARC import -------------------------------------------------------------


def _arc_bytes() -> bytes:
    def record(url, ip, date, mime, payload: bytes) -> bytes:
        header = f"{url} {ip} {date} {mime} {len(payload)}\n".encode()
        return header + payload + b"\n"

    version = b"filedesc://test.arc 0.0.0.0 20260101000000 text/plain 76\n" + b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"
    # the version block's declared length must match its payload
    payload_v = b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"
    version = (
        f"filedesc://test.arc 0.0.0.0 20260101000000 text/plain {len(payload_v)}\n".encode()
        + payload_v
        + b"\n"
    )
    r1 = record(
        "http://a.com/x", "1.2.3.4", "20251231235959", "text/html",
        b"<html><title>A</title></html>",
    )
    r2 = record("http://b.com/y", "5.6.7.8", "20260101120000", "text/plain", b"hello\nworld")
    return version + r1 + r2


def test_read_arc_plain_and_gzip(spark, tmp_path):
    raw = _arc_bytes()
    (tmp_path / "one.arc").write_bytes(raw)
    (tmp_path / "two.arc.gz").write_bytes(gzip.compress(raw))
    df = read_arc(spark, str(tmp_path))
    rows = sorted(
        (r["source_file"].rsplit("/", 1)[-1], r["url"], bytes(r["content"]))
        for r in df.collect()
    )
    assert len(rows) == 4  # 2 records x 2 files, version blocks skipped
    assert rows[0][1] == "http://a.com/x"
    assert rows[0][2].startswith(b"<html>")
    got = {r["url"]: r for r in df.collect()}
    assert got["http://b.com/y"]["fetch_time"] == datetime.datetime(2026, 1, 1, 12, 0, 0)
    assert got["http://a.com/x"]["content_type"] == "text/html"


# --- S6 IndexWriter protocol ------------------------------------------------


def test_index_documents_batching_and_routing(spark, tmp_path):
    import glob
    import json

    from nutch_spark.sources.indexers import JsonlIndexWriter, index_documents

    docs = spark.createDataFrame(
        [
            ("http://a.com/1", "ADD", "text/html"),
            ("http://a.com/2", "DELETE", "text/html"),
            ("http://a.com/3", "SKIP", "text/html"),
            ("http://b.com/1", "ADD", "application/pdf"),
        ],
        "url string, action string, type string",
    ).coalesce(1)

    all_dir, html_dir = str(tmp_path / "all"), str(tmp_path / "html")
    index_documents(
        docs,
        {
            "all": lambda: JsonlIndexWriter(all_dir),
            "html_only": lambda: JsonlIndexWriter(html_dir),
        },
        exchanges={"html_only": "type == 'text/html'"},
    )

    def load(d):
        out = []
        for p in glob.glob(d + "/*.jsonl"):
            out += [json.loads(l) for l in open(p)]
        return out

    everything = load(all_dir)
    adds = {e["doc"]["url"] for e in everything if e["action"] == "add"}
    dels = {e["id"] for e in everything if e["action"] == "delete"}
    assert adds == {"http://a.com/1", "http://b.com/1"}   # SKIP dropped
    assert dels == {"http://a.com/2"}

    html = load(html_dir)
    assert {e["doc"]["url"] for e in html if e["action"] == "add"} == {"http://a.com/1"}
    assert {e["id"] for e in html if e["action"] == "delete"} == {"http://a.com/2"}


def test_warc_round_trip(spark, tmp_path):
    # write_warc → read_warc reproduces url/content/fetch_time exactly
    import datetime as dt

    from nutch_spark.sources.arc import read_warc
    from nutch_spark.sources.exports import write_warc

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    log = spark.createDataFrame(
        [
            ("http://a.com/1", "fetch_success", t0, "<html>one</html>"),
            ("http://a.com/2", "fetch_success", t0, "cjk \u4e16\u754c two\r\nwith crlf"),
            ("http://skip.com/", "fetch_gone", t0, None),
        ],
        "url string, status string, fetch_time timestamp, content string",
    )
    path = str(tmp_path / "warc_out")
    write_warc(log, path)
    # .text() writes records line-by-line; read the produced files raw
    back = read_warc(spark, path + "/*.txt")
    rows = {r["url"]: r for r in back.collect()}
    assert set(rows) == {"http://a.com/1", "http://a.com/2"}
    assert rows["http://a.com/1"]["content"] == "<html>one</html>"
    assert rows["http://a.com/1"]["warc_type"] == "response"
    assert rows["http://a.com/1"]["fetch_time"] == t0
    # multibyte content survives: Content-Length is bytes, not chars
    assert rows["http://a.com/2"]["content"] == "cjk \u4e16\u754c two\r\nwith crlf"


def test_warc_parser_survives_corrupt_records():
    import gzip

    from nutch_spark.sources.arc import parse_warc_bytes

    # negative Content-Length must not hang or kill the record stream
    evil = (
        b"WARC/1.0\r\nContent-Length: -100\r\nWARC-Target-URI: http://bad/\r\n\r\nx"
        b"WARC/1.0\r\nContent-Length: 2\r\nWARC-Target-URI: http://ok/\r\n\r\nab"
    )
    assert [r["url"] for r in parse_warc_bytes(evil, "f")] == ["http://ok/"]
    # truncated gzip yields no rows instead of raising
    trunc = gzip.compress(b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab")[:10]
    assert parse_warc_bytes(trunc, "f") == []
    # garbled header (non-numeric length) skipped
    garb = b"WARC/1.0\r\nContent-Length: zz\r\n\r\nWARC/1.0\r\nContent-Length: 1\r\nWARC-Target-URI: http://g/\r\n\r\nz"
    assert [r["url"] for r in parse_warc_bytes(garb, "f")] == ["http://g/"]


# --- pagination scale path (round-4: keyset + distributed offset slice) -----


def test_keyset_pagination_equivalence(api):
    # walking the table cursor-by-cursor reproduces the full sorted order
    full = [r["url"] for r in api.db_fetchdb(from_=0, to=9)]
    walked, cursor = [], None
    while True:
        page = api.db_fetchdb_after(cursor=cursor, n=3)
        if not page:
            break
        walked.extend(r["url"] for r in page)
        cursor = page[-1]["url"]
    assert walked == full == sorted(full)


def test_offset_slice_plan_is_take_ordered(api):
    # _slice must NOT be a global row_number window (single-partition
    # exchange of the whole table); it must compile to a distributed
    # top-K (TakeOrderedAndProject / GlobalLimit with offset).
    plan = (
        api._slice(api.fetchdb, 2, 5, "url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "TakeOrdered" in plan or "GlobalLimit" in plan


def test_keyset_page_plan_pushes_filter(api, spark, tmp_path):
    # against a parquet-backed table the cursor predicate reaches the scan
    p = str(tmp_path / "db.parquet")
    api.fetchdb.write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        NutchReadApi.page_after(df, "url", "http://h0.com/3", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(url" in plan
    assert "Window" not in plan


def test_open_ended_fetchdb_raises_on_truncation(spark):
    import pytest as _pytest

    from nutch_spark.sources.rest import PageTruncatedError

    big = spark.range(0, 30_000).selectExpr("concat('http://x.com/', id) as url")
    api = NutchReadApi(fetchdb=big)
    # truncated open-ended read surfaces as an error pointing at keyset paging
    with _pytest.raises(PageTruncatedError, match="db_fetchdb_after"):
        api.db_fetchdb()
    # a bounded request of any size still works
    assert len(api.db_fetchdb(0, 19_999)) == 20_000
    # an open-ended read that fits under the cap returns everything
    small = spark.range(0, 5).selectExpr("concat('http://x.com/', id) as url")
    assert len(NutchReadApi(fetchdb=small).db_fetchdb()) == 5


# --- exotic ARC variants (round-4): v2 headers, resync, latin-1, truncation


def test_arc_v2_ten_field_header():
    from nutch_spark.sources.arc import parse_arc_bytes

    payload = b"<html>v2</html>"
    v2 = (
        "http://v2.com/p 1.2.3.4 20260102030405 text/html 200 "
        f"checksum - 0 file.arc {len(payload)}\n"
    ).encode() + payload + b"\n"
    recs = parse_arc_bytes(v2, "f")
    assert len(recs) == 1
    r = recs[0]
    assert r["url"] == "http://v2.com/p"
    assert r["content_type"] == "text/html"
    assert bytes(r["content"]) == payload


def test_arc_resync_after_garbage():
    from nutch_spark.sources.arc import parse_arc_bytes

    good = b"http://ok.com/a 1.1.1.1 20260101000000 text/plain 5\nhello\n"
    garbage = b"\x00\xffnot a header at all\nmore junk without structure\n"
    data = good + garbage + b"http://ok.com/b 2.2.2.2 20260101000001 text/plain 5\nworld\n"
    recs = parse_arc_bytes(data, "f")
    # first real record is NOT swallowed as a version block (no filedesc),
    # and the reader recovers past the garbage to the second record
    assert [r["url"] for r in recs] == ["http://ok.com/a", "http://ok.com/b"]


def test_arc_latin1_header_and_truncated_tail():
    from nutch_spark.sources.arc import parse_arc_bytes

    latin_url = "http://caf\xe9.example.com/p".encode("latin-1")
    r1 = latin_url + b" 1.1.1.1 20260101000000 text/html 4\nbody\n"
    # declared 100 bytes but the file ends early (interrupted transfer)
    r2 = b"http://tail.com/x 2.2.2.2 20260101000001 text/plain 100\nonly-this"
    recs = parse_arc_bytes(r1 + r2, "f")
    assert recs[0]["url"] == "http://caf\xe9.example.com/p"
    assert bytes(recs[1]["content"]) == b"only-this"  # short tail still emitted


def test_warc_round_trip_binary(spark, tmp_path):
    # round-10 byte-exact path: BINARY fetch content (FETCH_SCHEMA) writes
    # binary WARC records (one part-NNNNN.warc per partition) and
    # read_warc(binary=True) reproduces the payload bytes exactly —
    # including \r\n\r\n sequences and non-UTF-8 bytes inside the block
    import datetime as dt

    from nutch_spark.sources.arc import read_warc
    from nutch_spark.sources.exports import write_warc

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    payload_a = b"%PDF-1.4\x00\xff\xfe binary\r\n\r\nWARC/1.0 fake header"
    payload_b = "cjk 世界".encode("utf-8")
    log = spark.createDataFrame(
        [
            ("http://a.com/x.pdf", "fetch_success", t0, bytearray(payload_a)),
            ("http://a.com/t.txt", "fetch_success", t0, bytearray(payload_b)),
            ("http://skip.com/", "fetch_gone", t0, None),
        ],
        "url string, status string, fetch_time timestamp, content binary",
    )
    path = str(tmp_path / "warc_bin")
    write_warc(log, path)
    back = read_warc(spark, path + "/*.warc", binary=True)
    rows = {r["url"]: r for r in back.collect()}
    assert set(rows) == {"http://a.com/x.pdf", "http://a.com/t.txt"}
    assert bytes(rows["http://a.com/x.pdf"]["content"]) == payload_a
    assert bytes(rows["http://a.com/t.txt"]["content"]) == payload_b
    assert rows["http://a.com/x.pdf"]["fetch_time"] == t0
