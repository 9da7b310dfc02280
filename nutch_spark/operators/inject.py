"""Injector — seed ⟗ crawldb full-outer merge (SURVEY.md §2.3 J1).

Reference: /root/reference/src/java/org/apache/nutch/crawl/Injector.java
(merge rules documented :336-350, implemented :351-395):

  - URL only in seeds  -> new row, status db_unfetched, score db.score.injected,
    interval db.fetch.interval.default (seed metadata nutch.score /
    nutch.fetchInterval override).
  - URL only in db     -> kept unchanged.
  - in both, overwrite -> seed row replaces the db row.
  - in both, update    -> db row kept but metadata merged (seed precedence)
    and score/interval overridden by the seed's reserved keys.
  - in both, neither   -> db row kept unchanged (seed dropped).

Spark: one full_outer join + coalesce/CASE — Catalyst plans a single shuffle
on url (or a broadcast when the seed list is small, the common case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig


def inject(
    crawldb: DataFrame,
    seeds: DataFrame,
    *,
    cfg: NutchConfig = DEFAULT,
    now=None,
    normalize: bool = True,
    filter_predicate=None,
) -> DataFrame:
    """Merge seed URLs into the crawldb. ``seeds`` has (url, metadata).

    Seeds are NORMALIZED (and optionally filtered) before the merge, like
    the reference's InjectMapper (Injector.java:113-180, on by default,
    -noNormalize/-noFilter to disable): malformed seeds normalize to NULL
    and drop instead of polluting the db."""
    now = now if now is not None else F.current_timestamp()

    if normalize:
        from nutch_spark.functions.urls import normalize_url

        seeds = seeds.withColumn("url", normalize_url("url")).filter(
            F.col("url").isNotNull()
            # scheme-less garbage = the reference's MalformedURLException drop
            & F.col("url").rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
        )
    if filter_predicate is not None:
        seeds = seeds.filter(filter_predicate(F.col("url")))
    # distinct seed strings can normalize to one URL — keep exactly one row
    # per url (deterministic pick) so the url-keyed db invariant holds
    seeds = seeds.groupBy("url").agg(
        F.min_by(
            "metadata", F.md5(F.coalesce(F.to_json("metadata"), F.lit("")))
        ).alias("metadata")
    )

    seed_score = F.coalesce(
        F.element_at("metadata", "nutch.score").cast("float"),
        F.lit(float(cfg.score_injected)),
    )
    seed_interval = F.coalesce(
        F.element_at("metadata", "nutch.fetchInterval").cast("int"),
        F.lit(cfg.fetch_interval_default),
    )
    new_rows = seeds.select(
        F.col("url"),
        F.lit("db_unfetched").alias("status"),
        now.cast("timestamp").alias("fetch_time"),
        F.lit(0).alias("retries"),
        seed_interval.alias("fetch_interval"),
        seed_score.alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        F.lit(None).cast("timestamp").alias("modified_time"),
        F.map_filter(
            F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
            lambda k, _: ~k.isin("nutch.score", "nutch.fetchInterval", "nutch.fetchInterval.fixed"),
        ).alias("metadata"),
    )

    s = new_rows.alias("s")
    d = crawldb.alias("d")
    joined = d.join(s, on="url", how="full_outer")

    def pick(col: str):
        seed_c, db_c = F.col(f"s.{col}"), F.col(f"d.{col}")
        if cfg.inject_overwrite:
            return F.coalesce(seed_c, db_c)
        if cfg.inject_update and col in ("score", "fetch_interval"):
            return F.coalesce(seed_c, db_c)
        if cfg.inject_update and col == "metadata":
            # merge, seed precedence (Injector.java:372-380)
            return F.when(
                seed_c.isNotNull() & db_c.isNotNull(), F.map_concat(
                    F.map_filter(db_c, lambda k, _: ~F.array_contains(F.map_keys(seed_c), k)),
                    seed_c,
                )
            ).otherwise(F.coalesce(db_c, seed_c))
        return F.coalesce(db_c, seed_c)

    cols = [
        "status", "fetch_time", "retries", "fetch_interval",
        "score", "signature", "modified_time", "metadata",
    ]
    return joined.select(F.col("url"), *[pick(c).alias(c) for c in cols])


def merge_with_precedence(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    *,
    prefer: str = "delta",
) -> DataFrame:
    """Generic full-outer merge where one side wins on conflict.

    The relational core of J1 (and of CrawlDbMerger J10 for two inputs):
    useful directly over arbitrary keyed tables.
    """
    b, d = base.alias("b"), delta.alias("d")
    joined = b.join(d, on=key, how="full_outer")
    first, second = ("d", "b") if prefer == "delta" else ("b", "d")
    cols = [c for c in base.columns if c != key]
    return joined.select(
        F.col(key),
        *[F.coalesce(F.col(f"{first}.{c}"), F.col(f"{second}.{c}")).alias(c) for c in cols],
    )
