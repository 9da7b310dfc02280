"""The crawl pipeline — bin/crawl loop semantics (SURVEY.md §3, §7 step 12).

Reference: /root/reference/src/bin/crawl:285-430 — the canonical round:

    inject → loop{ generate → fetch → parse → updatedb → invertlinks → dedup }

Each stage is one of the engine's operators; a round is a pure function
(crawldb, linkdb) → (crawldb', linkdb', segment tables). Persistence between
rounds is plain Parquet overwrite-by-directory (the reference's atomic
install() via rename — CrawlDb.java:148; on Delta Lake this becomes a
transactional overwrite).

At 100 TB, every stage is one or two shuffles on url/host; nothing in the
loop holds driver-side state beyond the round counter.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.operators.dedup import deduplicate
from nutch_spark.operators.fetcher import emit_parse_rows, fetch, parse, synthetic_fetch_fn
from nutch_spark.operators.generate import generate
from nutch_spark.operators.inject import inject
from nutch_spark.operators.invertlinks import invert_links
from nutch_spark.operators.merge import merge_linkdbs
from nutch_spark.operators.updatedb import update_crawldb


@dataclass
class RoundResult:
    crawldb: DataFrame
    linkdb: DataFrame | None
    fetch_log: DataFrame
    parse_data: DataFrame
    stats: dict = field(default_factory=dict)


def crawl_round(
    crawldb: DataFrame,
    linkdb: DataFrame | None,
    *,
    top_n: int = 1000,
    cfg: NutchConfig = DEFAULT,
    fetch_fn=synthetic_fetch_fn,
    now: Column | None = None,
    dedup: bool = True,
    parser: str = "regex",
    robots: bool = False,
    robots_agent: str = "*",
) -> RoundResult:
    """One generate→fetch→parse→updatedb→invertlinks→dedup round.

    ``parser``: "regex" (vectorized JVM fast path) or "html" (tolerant
    stdlib HTMLParser with charset/base-href handling, operators/parse_html
    — the parse-html-plugin-grade path). Both produce the same parse_data
    shape.

    ``robots=True`` enforces robots.txt inside the fetch step (the
    reference fetcher's in-protocol handling): one robots fetch per host,
    forbidden urls become fetch_gone/_robots_denied_ rows — which this
    round's updatedb then transitions to db_gone — and Crawl-delay rides
    the per-host variable delay. Off by default: the synthetic test
    fetcher has no robots to fetch."""
    now = now if now is not None else F.current_timestamp()

    fetchlist = generate(crawldb, top_n, cfg=cfg, now=now)
    if robots:
        from nutch_spark.operators.robots import fetch_with_robots

        fetch_log, _robots_log = fetch_with_robots(
            fetchlist, cfg=cfg, fetch_fn=fetch_fn, agent=robots_agent
        )
    else:
        fetch_log = fetch(fetchlist, cfg=cfg, fetch_fn=fetch_fn)
    # A12 counters (the reference's per-job MR counters, NutchMetrics):
    # observe() rides the materialization below — no extra pass.
    obs = Observation("round_metrics")
    fetch_log = fetch_log.observe(
        obs,
        F.count(F.lit(1)).alias("pages_fetched"),
        F.count_if(F.col("status") == "fetch_success").alias("fetch_success"),
        F.count_if(F.col("status") == "fetch_gone").alias("fetch_gone"),
        F.count_if(F.col("status") == "fetch_retry").alias("fetch_retry"),
    )
    # one materialization per round: fetch is side-effecting/imperative, and
    # both parse and updatedb consume it (the reference writes the segment to
    # disk here for the same reason)
    fetch_log = fetch_log.localCheckpoint(eager=True)
    stats = dict(obs.get)

    if parser == "html":
        from nutch_spark.operators.parse_html import parse_html

        parse_data = parse_html(fetch_log, cfg=cfg)
    else:
        parse_data = parse(fetch_log, cfg=cfg)
    parse_emits = emit_parse_rows(
        parse_data, crawldb.select("url", "score"), cfg=cfg
    )
    fetch_rows = fetch_log.select(
        "url", "status", "fetch_time", "signature", "metadata"
    )
    new_db = update_crawldb(crawldb, fetch_rows, parse_emits, cfg=cfg, now=now)
    if dedup:
        new_db = deduplicate(new_db, cfg=cfg)

    round_links = invert_links(parse_data, cfg=cfg)
    new_linkdb = (
        round_links
        if linkdb is None
        else merge_linkdbs([linkdb, round_links], cfg=cfg)
    )
    return RoundResult(new_db, new_linkdb, fetch_log, parse_data, stats)


def crawl(
    seeds: DataFrame,
    *,
    rounds: int = 2,
    top_n: int = 1000,
    cfg: NutchConfig = DEFAULT,
    fetch_fn=synthetic_fetch_fn,
    now: Column | None = None,
    parser: str = "regex",
    robots: bool = False,
    robots_agent: str = "*",
) -> RoundResult:
    """inject + N rounds (bin/crawl:285-430). Returns the final state."""
    spark = seeds.sparkSession
    empty_db = spark.createDataFrame(
        [],
        "url string, status string, fetch_time timestamp, retries int, "
        "fetch_interval int, score float, signature binary, "
        "modified_time timestamp, metadata map<string,string>",
    )
    crawldb = inject(empty_db, seeds, cfg=cfg, now=now)
    result = RoundResult(crawldb, None, None, None)  # type: ignore[arg-type]
    for _ in range(rounds):
        result = crawl_round(
            result.crawldb,
            result.linkdb,
            top_n=top_n,
            cfg=cfg,
            fetch_fn=fetch_fn,
            now=now,
            parser=parser,
            robots=robots,
            robots_agent=robots_agent,
        )
        # truncate lineage between rounds (the reference writes each round's
        # tables to disk; localCheckpoint is the in-session analogue)
        result.crawldb = result.crawldb.localCheckpoint(eager=True)
        if result.linkdb is not None:
            result.linkdb = result.linkdb.localCheckpoint(eager=True)
    return result


def atomic_install(df: DataFrame, path: str, *, keep_old: bool = True) -> None:
    """The reference's CrawlDb.install() protocol (CrawlDb.java:148,
    LinkDb.java:307-323) for plain Parquet: write to ``path_tmp``, rotate
    ``path`` → ``path_old``, ``path_tmp`` → ``path``. Readers of the old
    snapshot keep a consistent view; a crash mid-install leaves either the
    old or the new complete directory. (On Delta Lake this whole function is
    one transactional overwrite.)"""
    tmp, old = path + "_tmp", path + "_old"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.parquet(tmp)
    if keep_old:
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.replace(path, old)
    else:
        shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def install_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str = "url",
    buckets: int = 64,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Materialize a db table BUCKETED on its join key (hash buckets +
    in-bucket sort). Every cross-round join — updatedb's db⋈fetch, inject's
    db⋈seeds, dedup's merge-back — reuses the bucketing: Spark plans a
    SortMergeJoin with NO Exchange on the bucketed side(s), which at crawl
    scale removes the dominant shuffle of every round.

    The reference's MapFile output is sorted-by-key per reducer — this is
    the same contract expressed in Spark's table format. Bucket count is a
    deployment constant (64 here; pick ~data/200 MB on a cluster); both
    sides of a co-located join must share it.
    """
    w = df.write.mode(mode).bucketBy(buckets, key).sortBy(key).format("parquet")
    if path is not None:
        w = w.option("path", path)  # external table location
    w.saveAsTable(table)
