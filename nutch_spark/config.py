"""Engine configuration.

Mirrors the knobs of /root/reference/conf/nutch-default.xml that affect query
semantics (not crawler networking).  Defaults match the reference so that
behavioural tests line up; everything is a plain dataclass field, no Hadoop
Configuration machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NutchConfig:
    # --- injector (crawl/Injector.java:336-350) -------------------------------
    inject_update: bool = False          # db.injector.update
    inject_overwrite: bool = False       # db.injector.overwrite
    score_injected: float = 1.0          # db.score.injected
    fetch_interval_default: int = 2_592_000  # db.fetch.interval.default (30 d)
    fetch_interval_max: int = 7_776_000      # db.fetch.interval.max (90 d)

    # --- generator (crawl/Generator.java) -------------------------------------
    generate_min_score: float = 0.0      # generate.min.score
    generate_max_count: int = -1         # generate.max.count (per host/domain)
    generate_count_mode: str = "host"    # generate.count.mode: host|domain
    generate_max_num_segments: int = 1   # -maxNumSegments
    partition_mode: str = "host"         # partition.url.mode: host|domain|ip

    # --- updatedb (crawl/CrawlDbReducer.java) ----------------------------------
    retry_max: int = 3                   # db.fetch.retry.max
    update_max_inlinks: int = 10_000     # db.update.max.inlinks
    additions_allowed: bool = True       # db.update.additions.allowed
    purge_404: bool = False              # db.update.purge.404
    purge_orphans: bool = False          # db.update.purge.orphans

    # --- adaptive fetch schedule (crawl/AdaptiveFetchSchedule.java:78-370) -----
    adaptive_inc_rate: float = 0.4       # db.fetch.schedule.adaptive.inc_rate
    adaptive_dec_rate: float = 0.2       # db.fetch.schedule.adaptive.dec_rate
    adaptive_min_interval: int = 60      # ...adaptive.min_interval
    adaptive_max_interval: int = 31_536_000  # ...adaptive.max_interval (365 d)
    adaptive_sync_delta: bool = True     # ...adaptive.sync_delta
    adaptive_sync_delta_rate: float = 0.3

    # --- linkdb (crawl/LinkDb.java, LinkDbMerger.java:95-110) ------------------
    linkdb_max_inlinks: int = 10_000     # linkdb.max.inlinks
    linkdb_max_anchor_length: int = 100  # linkdb.max.anchor.length
    linkdb_ignore_internal_links: bool = True
    linkdb_ignore_external_links: bool = False

    # --- outlinks (parse/ParseOutputFormat.java:150-362) -----------------------
    max_outlinks_per_page: int = 100     # db.max.outlinks.per.page
    max_outlink_length: int = 4096       # db.max.outlink.length
    ignore_internal_links: bool = False  # db.ignore.internal.links
    ignore_external_links: bool = False  # db.ignore.external.links
    ignore_external_links_mode: str = "byHost"  # db.ignore.external.links.mode

    # --- parse-metatags (MetaTagsParser.java:55-62) ----------------------------
    metatags_names: tuple[str, ...] = ("*",)  # metatags.names ('*' = all)

    # --- parse-js (JSParseFilter.java) -----------------------------------------
    # opt-in like the reference (parse-js is not in default plugin.includes)
    parse_js_filter: bool = False  # parse.js.enabled (our activation switch)

    # --- parsefilter-debug (DebugParseFilter.java) -----------------------------
    # opt-in like the reference (activated by plugin.includes there); stores
    # the re-serialized markup under parse meta key "DOM"
    parse_debug_dom: bool = False  # parse.debug.dom (our activation switch)

    # --- fetcher (fetcher/Fetcher.java, conf/nutch-default.xml) ----------------
    http_content_limit: int = 1_048_576  # http.content.limit (bytes; -1 = off)
    http_if_modified_since: bool = True  # http.enable.if.modified.since.header
    http_enable_cookie_header: bool = True  # http.enable.cookie.header
    http_store_responsetime: bool = True  # http.store.responsetime
    http_proxy_host: str = ""            # http.proxy.host ("" = no proxy)
    http_proxy_port: int = 8080          # http.proxy.port
    http_proxy_exception_list: str = ""  # http.proxy.exception.list (csv hosts)
    http_accept: str = "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"  # http.accept
    http_accept_language: str = "en-us,en-gb,en;q=0.7,*;q=0.3"  # http.accept.language
    http_accept_charset: str = "utf-8,iso-8859-1;q=0.7,*;q=0.7"  # http.accept.charset
    http_agent_name: str = "nutch-spark"  # http.agent.name ("" = refuse fetch)
    redirect_max: int = 0                # http.redirect.max (0 = record, don't follow)
    fetcher_server_delay: float = 5.0    # fetcher.server.delay (s)
    fetcher_server_min_delay: float = 0.0  # fetcher.server.min.delay (s, used when threads.per.queue > 1)
    fetcher_threads: int = 10            # fetcher.threads.fetch
    fetcher_threads_per_queue: int = 1   # fetcher.threads.per.queue
    fetcher_time_limit_s: float = -1.0   # fetcher.timelimit.mins * 60 (-1 = off)
    throughput_threshold_pages: float = -1.0  # fetcher.throughput.threshold.pages (pages/s, -1 = off)
    throughput_threshold_retries: int = 5     # fetcher.throughput.threshold.retries

    # --- dedup (crawl/DeduplicationJob.java) -----------------------------------
    dedup_group_mode: str = "none"       # deduplication.group.mode: none|host|domain
    dedup_compare_order: tuple[str, ...] = ("score", "fetchTime", "httpsOverHttp", "urlLength")

    # --- scoring (scoring-opic OPICScoringFilter.java:85-187) ------------------
    score_internal_factor: float = 1.0   # db.score.link.internal
    score_external_factor: float = 1.0   # db.score.link.external
    score_count_filtered: bool = False   # db.score.count.filtered
    link_score_updater_clear_score: float = 0.0  # link.score.updater.clear.score

    # --- linkrank (scoring/webgraph/LinkRank.java) ------------------------------
    linkrank_iterations: int = 10        # link.analyze.num.iterations
    linkrank_damping: float = 0.85       # link.analyze.damping.factor
    linkrank_initial_score: float = 1.0  # link.analyze.initial.score
    webgraph_delete_gone: bool = False   # link.delete.gone

    # --- indexer (IndexerMapReduce.java:66-75) --------------------------------
    indexer_add_binary_content: bool = False  # indexer.add.binary.content
    indexer_binary_base64: bool = False       # indexer.binary.base64

    # --- hostdb (conf/nutch-default.xml:2957-2974) ------------------------------
    hostdb_numeric_fields: tuple[str, ...] = ()
    hostdb_string_fields: tuple[str, ...] = ()
    hostdb_percentiles: tuple[int, ...] = (50, 75, 95, 99)

    # --- stats (crawl/CrawlDbReader.java:706-707) -------------------------------
    stats_score_quantiles: tuple[float, ...] = (
        0.01, 0.05, 0.1, 0.2, 0.25, 0.3, 0.4, 0.5,
        0.6, 0.7, 0.75, 0.8, 0.9, 0.95, 0.99,
    )

    extras: dict = field(default_factory=dict)

    @classmethod
    def from_properties(cls, props: dict) -> "NutchConfig":
        """Build a config from nutch-default.xml property names — the
        ConfManager surface: a REST-created config dict of xml keys becomes
        a typed NutchConfig. Unknown keys land in ``extras`` (the reference
        keeps them in the Hadoop Configuration for plugins to read). Values
        arrive as strings over the API; booleans/numbers are coerced by the
        target field's current type."""
        import dataclasses

        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs: dict = {}
        extras: dict = {}
        for key, value in (props or {}).items():
            if key == "fetcher.timelimit.mins":  # stored in seconds here
                kwargs["fetcher_time_limit_s"] = float(value) * 60.0
                continue
            name = PROPERTY_MAP.get(key)
            if name is None:
                extras[key] = value
                continue
            default = getattr(DEFAULT, name)
            if isinstance(default, bool):
                value = str(value).lower() in ("true", "1", "yes")
            elif isinstance(default, int):
                value = int(value)
            elif isinstance(default, float):
                value = float(value)
            elif isinstance(default, tuple):
                value = tuple(value) if not isinstance(value, str) else tuple(
                    v.strip() for v in value.split(",") if v.strip()
                )
            kwargs[name] = value
        assert set(kwargs) <= set(fields)
        return cls(**kwargs, extras=extras)


# nutch-default.xml property name -> NutchConfig field (the keys cited in
# the field comments above, plus the fetcher.timelimit.mins conversion)
PROPERTY_MAP = {
    "db.injector.update": "inject_update",
    "db.injector.overwrite": "inject_overwrite",
    "db.score.injected": "score_injected",
    "db.fetch.interval.default": "fetch_interval_default",
    "db.fetch.interval.max": "fetch_interval_max",
    "generate.min.score": "generate_min_score",
    "generate.max.count": "generate_max_count",
    "generate.count.mode": "generate_count_mode",
    "partition.url.mode": "partition_mode",
    "db.fetch.retry.max": "retry_max",
    "db.update.max.inlinks": "update_max_inlinks",
    "db.update.additions.allowed": "additions_allowed",
    "db.update.purge.404": "purge_404",
    "db.update.purge.orphans": "purge_orphans",
    "db.fetch.schedule.adaptive.inc_rate": "adaptive_inc_rate",
    "db.fetch.schedule.adaptive.dec_rate": "adaptive_dec_rate",
    "db.fetch.schedule.adaptive.min_interval": "adaptive_min_interval",
    "db.fetch.schedule.adaptive.max_interval": "adaptive_max_interval",
    "db.fetch.schedule.adaptive.sync_delta": "adaptive_sync_delta",
    "db.fetch.schedule.adaptive.sync_delta_rate": "adaptive_sync_delta_rate",
    "linkdb.max.inlinks": "linkdb_max_inlinks",
    "linkdb.max.anchor.length": "linkdb_max_anchor_length",
    "linkdb.ignore.internal.links": "linkdb_ignore_internal_links",
    "linkdb.ignore.external.links": "linkdb_ignore_external_links",
    "db.max.outlinks.per.page": "max_outlinks_per_page",
    "db.max.outlink.length": "max_outlink_length",
    "db.ignore.internal.links": "ignore_internal_links",
    "db.ignore.external.links": "ignore_external_links",
    "db.ignore.external.links.mode": "ignore_external_links_mode",
    "metatags.names": "metatags_names",
    "parse.js.enabled": "parse_js_filter",
    "parse.debug.dom": "parse_debug_dom",
    "http.content.limit": "http_content_limit",
    "http.enable.if.modified.since.header": "http_if_modified_since",
    "http.enable.cookie.header": "http_enable_cookie_header",
    "http.store.responsetime": "http_store_responsetime",
    "http.proxy.host": "http_proxy_host",
    "http.proxy.port": "http_proxy_port",
    "http.proxy.exception.list": "http_proxy_exception_list",
    "http.accept": "http_accept",
    "http.accept.language": "http_accept_language",
    "http.accept.charset": "http_accept_charset",
    "http.agent.name": "http_agent_name",
    "http.redirect.max": "redirect_max",
    "fetcher.server.delay": "fetcher_server_delay",
    "fetcher.server.min.delay": "fetcher_server_min_delay",
    "fetcher.threads.fetch": "fetcher_threads",
    "fetcher.threads.per.queue": "fetcher_threads_per_queue",
    "fetcher.throughput.threshold.pages": "throughput_threshold_pages",
    "fetcher.throughput.threshold.retries": "throughput_threshold_retries",
    "deduplication.group.mode": "dedup_group_mode",
    "deduplication.compare.order": "dedup_compare_order",
    "db.score.link.internal": "score_internal_factor",
    "db.score.link.external": "score_external_factor",
    "db.score.count.filtered": "score_count_filtered",
    "link.score.updater.clear.score": "link_score_updater_clear_score",
    "link.analyze.num.iterations": "linkrank_iterations",
    "link.analyze.damping.factor": "linkrank_damping",
    "link.analyze.initial.score": "linkrank_initial_score",
    "link.delete.gone": "webgraph_delete_gone",
    "indexer.add.binary.content": "indexer_add_binary_content",
    "indexer.binary.base64": "indexer_binary_base64",
}


DEFAULT = NutchConfig()
