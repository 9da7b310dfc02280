"""parse-js tests — port of TestJSParseFilter.java (pure-JS file parse +
embedded-JS HTML filter) against the reference plugin's sample semantics."""

from __future__ import annotations

from nutch_spark.config import NutchConfig
from nutch_spark.operators.parse_js import extract_js_links, parse_js, parse_js_file

# condensed twin of parse-js/sample/parse_pure_js_test.js
PURE_JS = """// test data for link extraction from "pure" JavaScript
function selectProvider(form) {
    provider = form.elements['searchProvider'].value;
    if (provider == "lucid") {
        form.action = "http://search.lucidimagination.com/p:nutch";
    } else if (provider == "sl") {
        form.action = "http://search-lucene.com/nutch";
    }
    days = 90; // cookie will be valid for 90 days
    document.cookie = "searchProvider=" + provider + "; path=/";
}
"""


def test_pure_js_outlinks():
    # TestJSParseFilter: exactly the two provider URLs, in order
    parsed = parse_js_file("http://nutch.apache.org/x.js", PURE_JS)
    assert parsed["outlinks"] == [
        "http://search.lucidimagination.com/p:nutch",
        "http://search-lucene.com/nutch",
    ]
    assert parsed["title"].startswith("// test data")
    assert len(parsed["title"]) <= 80


def test_js_link_candidates():
    base = "http://host.com/dir/page.html"
    # www. prefix gains http://, relative resolves vs base, &amp; unescapes
    js = (
        "a = 'www.example.org/path'; "
        'b = "about_files/menu.js"; '
        'c = "http://x.com/q?a=1&amp;b=2"; '
        'd = "noturl"; e = "two words.com"; '
    )
    got = extract_js_links(js, base)
    assert got == [
        "http://www.example.org/path",
        "http://host.com/dir/about_files/menu.js",
        "http://x.com/q?a=1&b=2",
    ]


def test_embedded_js_html_filter():
    from nutch_spark.operators.parse_html import parse_html_page

    html = (
        "<html><head><script type=\"text/javascript\">\n"
        'form.action = "http://search.lucidimagination.com/p:nutch";\n'
        'form.action = "http://search-lucene.com/nutch";\n'
        "</script></head>"
        "<body onload=\"init('http://evt.com/h.js')\">"
        '<a href="javascript:open(\'http://pop.com/win.html\')">x</a>'
        '<a href="/plain">plain</a></body></html>'
    )
    cfg = NutchConfig(parse_js_filter=True)
    out = parse_html_page("http://nutch.apache.org/about.html", html, cfg=cfg)
    urls = [u for u, _ in out["outlinks"]]
    assert "http://nutch.apache.org/plain" in urls
    assert "http://search.lucidimagination.com/p:nutch" in urls
    assert "http://search-lucene.com/nutch" in urls
    assert "http://evt.com/h.js" in urls
    assert "http://pop.com/win.html" in urls
    # default config: the filter is off (plugin not in default includes)
    off = parse_html_page("http://nutch.apache.org/about.html", html)
    assert [u for u, _ in off["outlinks"]] == ["http://nutch.apache.org/plain"]


def test_parse_js_dataframe(spark):
    df = spark.createDataFrame(
        [("http://h.com/a.js", PURE_JS.encode()), ("http://h.com/empty.js", None)],
        "url string, content binary",
    )
    rows = {r["url"]: r for r in parse_js(df).collect()}
    assert set(rows) == {"http://h.com/a.js"}
    assert rows["http://h.com/a.js"]["outlinks"] == [
        "http://search.lucidimagination.com/p:nutch",
        "http://search-lucene.com/nutch",
    ]
    assert rows["http://h.com/a.js"]["parse_text"] == PURE_JS
