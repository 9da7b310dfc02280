"""JS-rendering fetch hook: selenium/interactiveselenium semantics with an
injected fake browser, end-to-end through the polite-fetch harness."""

from __future__ import annotations

from pyspark.sql import Row

from nutch_spark.operators.fetcher import fetch
from nutch_spark.operators.render import RenderedPage, make_rendering_fetch_fn


def _fake_render(url: str):
    # deterministic "browser": JS expands a data attribute into links
    return RenderedPage(
        page_source=(
            f'<html><body><p>rendered {url}</p>'
            f'<a href="{url}/ajax-link">x</a></body></html>'
        ),
        current_url=url + "#rendered",
    )


def test_render_only_fetch_fn():
    fn = make_rendering_fetch_fn(_fake_render)
    out = fn("http://a.com/p")
    assert out["status"] == "fetch_success"
    assert "rendered http://a.com/p" in out["content"]
    assert out["metadata"]["_rendered_"] == "1"
    assert out["metadata"]["_rendered_url_"] == "http://a.com/p#rendered"


def test_base_fetch_gates_rendering():
    # non-200 and non-HTML responses never start the browser
    calls = []

    def render(url):
        calls.append(url)
        return _fake_render(url)

    def base(url):
        if url.endswith(".pdf"):
            return {
                "status": "fetch_success",
                "content": "raw-pdf-bytes",
                "content_type": "application/pdf",
                "metadata": {},
            }
        if url.endswith("/gone"):
            return {"status": "fetch_gone", "content": None,
                    "content_type": None, "metadata": {"nutch.protocol.code": "404"}}
        return {"status": "fetch_success", "content": "<html>raw</html>",
                "content_type": "text/html; charset=utf-8", "metadata": {}}

    fn = make_rendering_fetch_fn(render, base_fetch_fn=base)
    pdf = fn("http://a.com/x.pdf")
    assert pdf["content"] == "raw-pdf-bytes" and calls == []
    gone = fn("http://a.com/gone")
    assert gone["status"] == "fetch_gone" and calls == []
    html = fn("http://a.com/page")
    assert calls == ["http://a.com/page"]
    assert "rendered" in html["content"]  # DOM replaced the raw body
    assert html["metadata"]["_rendered_"] == "1"


def test_interactive_handler_chain_concatenates():
    class DomHandler:  # DefaultHandler: return the page source
        def process_driver(self, driver):
            return driver.page_source

        def should_process_url(self, url):
            return True

    class AjaxHandler:  # a second handler appends its harvested data
        def process_driver(self, driver):
            return "<!-- ajax: extra -->"

        def should_process_url(self, url):
            return "ajax" in url

    fn = make_rendering_fetch_fn(
        _fake_render, handlers=(DomHandler(), AjaxHandler())
    )
    plain = fn("http://a.com/p")
    assert plain["content"].endswith("</html>")  # only DomHandler applied
    ajax = fn("http://a.com/ajax-page")
    assert ajax["content"].endswith("<!-- ajax: extra -->")


def test_render_crash_maps_to_retry():
    def broken(url):
        raise RuntimeError("browser died")

    out = make_rendering_fetch_fn(broken)("http://a.com/p")
    assert out["status"] == "fetch_retry"
    assert "browser died" in out["metadata"]["_exception_"]


def test_rendering_fetch_fn_in_polite_harness(spark):
    # the hook is a drop-in fetch_fn for the mapInPandas fetch harness;
    # the renderer is defined locally so cloudpickle ships it by value
    def local_render(url: str):
        return RenderedPage(
            page_source=f"<html><body>rendered {url}</body></html>",
            current_url=url,
        )

    urls = spark.createDataFrame(
        [Row(url=f"http://h{i % 2}.example.com/p{i}") for i in range(6)]
    )
    log = fetch(
        urls, fetch_fn=make_rendering_fetch_fn(local_render), crawl_delay_s=0.0
    )
    rows = log.collect()
    assert len(rows) == 6
    assert all(r["status"] == "fetch_success" for r in rows)
    assert all(b"rendered http://" in r["content"] for r in rows)
    assert all(r["metadata"]["_rendered_"] == "1" for r in rows)
