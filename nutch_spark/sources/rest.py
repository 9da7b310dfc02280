"""S11 — the REST read API as a thin handler layer over the operators.

Reference: /root/reference/openapi.yaml:443-771 (db/crawldb, db/fetchdb,
reader/{sequence,link,node}/read, seed lists) backed by
api/impl/db/DbReader and reader/{Link,Node,SequenceFile}Reader.

This module is the handler layer an HTTP frontend (any WSGI/ASGI server)
would call — each method maps one read endpoint onto the existing DataFrame
operators and returns plain Python data (the JSON bodies of the responses).
No HTTP server ships here: serving is deployment-specific, the query logic
is not.

Scale note: every endpoint bounds its result (stats aggregate, topN limit,
url point-lookup, from/to slices) — nothing collects an unbounded
DataFrame to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.operators.stats import crawldb_stats, top_n


class PageTruncatedError(RuntimeError):
    """An open-ended read would exceed MAX_PAGE — the caller must paginate.

    Raised instead of silently returning a capped page so existing callers
    of to=0/end=None reads can't mistake a truncated result for the whole
    table. An HTTP frontend maps this to 413/416 with the same message."""


class NutchReadApi:
    """Read-endpoint handlers. Construct with the tables a crawl produced."""

    def __init__(
        self,
        crawldb: DataFrame | None = None,
        fetchdb: DataFrame | None = None,
        linkdb: DataFrame | None = None,
        nodedb: DataFrame | None = None,
        seeds: dict[str, list[str]] | None = None,
    ) -> None:
        self.crawldb = crawldb
        self.fetchdb = fetchdb
        self.linkdb = linkdb
        self.nodedb = nodedb
        self.seeds = dict(seeds or {})

    # -- POST /db/crawldb (openapi.yaml:443-486, DbQuery type dispatch) ------
    def db_crawldb(self, query: dict) -> dict | list[dict]:
        qtype = query.get("type")
        args = query.get("args") or {}
        if self.crawldb is None:
            raise ValueError("no crawldb attached")
        if qtype == "stats":
            sections = crawldb_stats(self.crawldb)
            return {
                name: [r.asDict(recursive=True) for r in df.collect()]
                for name, df in sections.items()
            }
        if qtype == "url":
            url = args.get("url")
            rows = self.crawldb.filter(F.col("url") == url).limit(1).collect()
            return rows[0].asDict(recursive=True) if rows else {}
        if qtype == "topN":
            n = int(args.get("topN", 10))
            min_score = float(args.get("minScore", 0.0))
            df = self.crawldb
            if min_score > 0:
                df = df.filter(F.col("score") >= min_score)
            rows = top_n(df, n, "score", tie_break="url").select("url", "score").collect()
            return [r.asDict() for r in rows]
        if qtype == "dump":
            # binary dump endpoint: bounded page of the db ordered by url
            n = int(args.get("limit", 1000))
            rows = self.crawldb.orderBy("url").limit(n).collect()
            return [r.asDict(recursive=True) for r in rows]
        raise ValueError(f"unknown DbQuery type {qtype!r}")

    # Hard cap on any single page a read endpoint will return. An open-ended
    # request (to=0 / end=None) pages up to this many rows instead of
    # collecting the whole table — on a 100 TB crawldb "all entries" through
    # a REST endpoint is always a bug, never a requirement. Truncation is
    # NEVER silent: an open-ended read whose result would exceed the cap
    # raises PageTruncatedError pointing at the keyset-paged endpoints.
    MAX_PAGE = 10_000

    @classmethod
    def _collect_open_page(cls, df: DataFrame) -> list:
        """Collect an open-ended slice; raise instead of silently truncating.

        ``_slice`` over-fetches one row past MAX_PAGE for open-ended
        requests, so a full-length result here proves there was more."""
        rows = df.collect()
        if len(rows) > cls.MAX_PAGE:
            raise PageTruncatedError(
                f"open-ended read exceeds MAX_PAGE={cls.MAX_PAGE}; use "
                "cursor pagination (db_fetchdb_after / page_after) or pass "
                "an explicit end bound"
            )
        return rows

    # -- GET /db/fetchdb?from=&to= (openapi.yaml:487-530) --------------------
    def db_fetchdb(self, from_: int = 0, to: int = 0) -> list[dict]:
        if self.fetchdb is None:
            raise ValueError("no fetchdb attached")
        end = to if to and to > 0 else None  # to=0 → from start, MAX_PAGE cap
        df = self._slice(self.fetchdb, from_, end, "url")
        rows = df.collect() if end is not None else self._collect_open_page(df)
        return [r.asDict(recursive=True) for r in rows]

    # -- POST /reader/{link,node,sequence}/read (openapi.yaml:590-771) -------
    @classmethod
    def _slice(cls, df: DataFrame, start: int | None, end: int | None, key: str) -> DataFrame:
        """Bounded offset slice [start, end] of ``df`` ordered by ``key``.

        Compiles to a single distributed TakeOrderedAndProject(limit=end+1,
        offset=start) — every partition contributes its local top rows and
        only limit-offset rows ever reach the driver. The previous
        implementation (row_number over an unpartitioned window) forced the
        ENTIRE table through one partition per page request; at crawl scale
        that is a single-executor sort of the world. Open-ended slices are
        capped at MAX_PAGE; deep paging should use :meth:`page_after`
        (keyset) instead, which is O(page) regardless of depth.
        """
        start = start or 0
        # open-ended: fetch one row past the cap so the collector can tell
        # "exactly MAX_PAGE rows" from "truncated" and raise
        n = (end - start + 1) if end is not None else cls.MAX_PAGE + 1
        out = df.orderBy(key)
        if start > 0:
            out = out.offset(start)
        return out.limit(max(n, 0))

    @classmethod
    def page_after(
        cls, df: DataFrame, key: str, cursor: str | None = None, n: int = 1000
    ) -> DataFrame:
        """Keyset pagination: the next ``n`` rows ordered by ``key``, strictly
        after ``cursor`` (None → first page). The predicate pushes into the
        parquet scan (PushedFilters: GreaterThan(key, cursor)) and the limit
        is a distributed top-K, so page cost is O(n) at any depth — the
        scale-safe way to walk a 100 TB table through the API. The caller
        feeds the last row's key back as the next cursor."""
        n = min(n, cls.MAX_PAGE)
        if cursor is not None:
            df = df.filter(F.col(key) > cursor)
        return df.orderBy(key).limit(n)

    def db_fetchdb_after(self, cursor: str | None = None, n: int = 1000) -> list[dict]:
        """Cursor-paged fetchdb read — the scale path for full-table walks."""
        if self.fetchdb is None:
            raise ValueError("no fetchdb attached")
        rows = self.page_after(self.fetchdb, "url", cursor, n).collect()
        return [r.asDict(recursive=True) for r in rows]

    def link_read(self, start: int | None = None, end: int | None = None) -> list[dict]:
        if self.linkdb is None:
            raise ValueError("no linkdb attached")
        df = self._slice(self.linkdb, start, end, "to_url")
        rows = df.collect() if end is not None else self._collect_open_page(df)
        return [r.asDict(recursive=True) for r in rows]

    def link_schema(self) -> dict:
        return {f.name: f.dataType.simpleString() for f in (self.linkdb or _empty()).schema}

    def node_read(self, start: int | None = None, end: int | None = None) -> list[dict]:
        if self.nodedb is None:
            raise ValueError("no nodedb attached")
        df = self._slice(self.nodedb, start, end, "url")
        rows = df.collect() if end is not None else self._collect_open_page(df)
        return [r.asDict(recursive=True) for r in rows]

    def node_schema(self) -> dict:
        return {f.name: f.dataType.simpleString() for f in (self.nodedb or _empty()).schema}

    def sequence_read(
        self, df: DataFrame, start: int | None = None, end: int | None = None
    ) -> list[list]:
        key = df.columns[0]
        sliced = self._slice(df, start, end, key)
        rows = sliced.collect() if end is not None else self._collect_open_page(sliced)
        return [list(r) for r in rows]

    # -- GET /seed/ + POST /seed/create (openapi.yaml:535-589) ---------------
    def get_seed_lists(self) -> dict[str, list[str]]:
        return dict(self.seeds)

    def create_seed_list(self, name: str, urls: list[str]) -> str:
        self.seeds[name] = list(urls)
        return name


def _empty():
    raise ValueError("no table attached")
