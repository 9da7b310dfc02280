"""JS-rendering protocol hook: protocol-selenium / protocol-htmlunit /
protocol-interactiveselenium counterparts.

Reference: src/plugin/protocol-selenium/.../HttpResponse.java:355-362
(rendered DOM replaces the fetched body), lib-selenium HttpWebClient.java
(driver construction, page.load.delay), and protocol-interactiveselenium/
HttpResponse.java:395-409 + handlers/InteractiveSeleniumHandler.java (the
content becomes the concatenation of each applicable handler's
``processDriver`` output).

A real browser cannot live in this container, so the browser is an INJECTED
dependency: ``render_fn(url) -> driver`` where the driver exposes
``page_source`` (and whatever else the deployment's handlers use — the
reference handlers receive the full WebDriver too). Deployments pass a
Selenium/Playwright-backed ``render_fn``; tests pass a deterministic fake.
Everything around the browser — the fetch_fn result contract, the handler
chain, HTML-only gating against the base protocol response, error mapping —
is real and tested.

Scale shape: the returned fetch_fn slots into the polite-fetch mapInPandas
harness (operators/fetcher.py) like http_fetch_fn — per-host queueing,
crawl delays, redirects and kill-switches all apply unchanged; rendering
happens inside the executor task, one page at a time per queue slot, which
is exactly how the reference serializes WebDriver use per fetcher thread.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol, runtime_checkable

__all__ = [
    "RenderedPage",
    "InteractiveHandler",
    "make_rendering_fetch_fn",
]


@dataclass
class RenderedPage:
    """Minimal driver stand-in for render_fns that don't hand back a real
    WebDriver: the rendered DOM plus the post-JS final URL (redir.js)."""

    page_source: str
    current_url: str | None = None


@runtime_checkable
class InteractiveHandler(Protocol):
    """InteractiveSeleniumHandler (handlers/InteractiveSeleniumHandler.java):
    ``process_driver`` may interact with the page (click, scroll, run JS)
    and returns the text to accumulate; ``should_process_url`` gates which
    URLs the handler applies to."""

    def process_driver(self, driver) -> str: ...

    def should_process_url(self, url: str) -> bool: ...


def _page_source(driver) -> str:
    src = getattr(driver, "page_source", None)
    if src is not None:
        return src
    return driver if isinstance(driver, str) else ""


def make_rendering_fetch_fn(
    render_fn: Callable[[str], object],
    *,
    base_fetch_fn: Callable[[str], dict | tuple] | None = None,
    handlers: tuple[InteractiveHandler, ...] = (),
) -> Callable[[str], dict]:
    """A fetch_fn whose successful HTML responses carry the browser-rendered
    DOM instead of the raw body.

    - ``render_fn(url)`` → driver/RenderedPage/str: the injected browser.
    - ``base_fetch_fn``: optional underlying protocol fetch (http_fetch_fn);
      its status/headers survive, only successful text/html content is
      re-rendered (protocol-selenium HttpResponse.java:296-362 renders after
      the plain HTTP exchange established code + Content-Type). Without it,
      the page is render-only: status comes from the browser alone.
    - ``handlers``: protocol-interactiveselenium chain — when non-empty, the
      content is the CONCATENATION of each applicable handler's
      ``process_driver`` return (HttpResponse.java:395-409), not the page
      source; a handler that wants the DOM returns ``driver.page_source``
      itself (DefaultHandler does exactly that).

    A render_fn exception maps to fetch_retry with ``_exception_`` metadata,
    the same contract http_fetch_fn uses for transport failures."""

    def fetch(url: str) -> dict:
        status = "fetch_success"
        ctype: str | None = "text/html"
        meta: dict = {}
        content: str | None = None
        if base_fetch_fn is not None:
            res = base_fetch_fn(url)
            if isinstance(res, dict):
                status, content = res["status"], res.get("content")
                ctype = res.get("content_type") or ctype
                meta = dict(res.get("metadata") or {})
            else:
                status, content = res
            if status != "fetch_success" or (
                ctype and "html" not in ctype.lower()
            ):
                # non-HTML or non-200: the browser never starts
                # (HttpResponse.java only renders html content)
                return {
                    "status": status,
                    "content": content,
                    "content_type": ctype,
                    "metadata": meta,
                }
        try:
            driver = render_fn(url)
        except Exception as exc:  # noqa: BLE001 — browser crash == retry
            meta["_exception_"] = f"{type(exc).__name__}: {exc}"
            return {
                "status": "fetch_retry",
                "content": None,
                "content_type": None,
                "metadata": meta,
            }
        if handlers:
            parts = [
                h.process_driver(driver)
                for h in handlers
                if h.should_process_url(url)
            ]
            content = "".join(p for p in parts if p)
        else:
            content = _page_source(driver)
        final_url = getattr(driver, "current_url", None)
        if final_url and final_url != url:
            meta["_rendered_url_"] = final_url
        meta["_rendered_"] = "1"
        return {
            "status": status,
            "content": content,
            "content_type": ctype,
            "metadata": meta,
        }

    return fetch
