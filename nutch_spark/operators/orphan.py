"""Orphan scoring (SURVEY.md §2.10 D8) and similarity scoring (D5).

Reference:
- scoring-orphan (/root/reference/src/plugin/scoring-orphan/, invoked from
  crawl/CrawlDbReducer.java:180-186): pages that have had no inlinks for a
  configured period are marked db_orphan / purged
  (crawl/CrawlDbFilter.java orphan counter).
- scoring-similarity (/root/reference/src/plugin/scoring-similarity/.../
  CosineSimilarity.java): cosine/TF-IDF similarity of a document against a
  gold-standard corpus steers focused crawling (the generator sort value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.datapipe.textstats import tokens


def mark_orphans(
    crawldb: DataFrame,
    linkdb: DataFrame,
    *,
    purge: bool = False,
    protected_status: tuple[str, ...] = ("db_unfetched",),
) -> DataFrame:
    """D8: rows with no entry in the linkdb (no inlinks) become db_orphan.

    Spark shape: LEFT ANTI join against the linkdb keys — the one place the
    reference's implicit anti-join semantics (SURVEY.md §2.3 note) surface as
    a real operator. Newly injected URLs (db_unfetched) are protected: they
    have no inlinks by construction.
    """
    targets = linkdb.select(F.col("to_url").alias("url")).distinct()
    orphans = (
        crawldb.join(targets, "url", "left_anti")
        .filter(~F.col("status").isin(*protected_status))
        .select("url")
    )
    if purge:
        return crawldb.join(orphans, "url", "left_anti")
    flagged = orphans.withColumn("_orphan", F.lit(True))
    return (
        crawldb.join(flagged, "url", "left")
        .withColumn(
            "status",
            F.when(F.col("_orphan"), F.lit("db_orphan")).otherwise(F.col("status")),
        )
        .drop("_orphan")
    )


def tf_cosine_to_goldstandard(
    docs: DataFrame,
    gold_tokens: list[str],
    *,
    text: str = "text",
    out_col: str = "similarity_score",
) -> DataFrame:
    """D5: term-frequency cosine of each document against a gold-standard
    token list (CosineSimilarity.java semantics, TF weights).

    The gold vector is tiny → inlined as literals (broadcast-equivalent);
    the document side is a single map stage, no shuffle. Used as the
    generator sort value for focused crawling."""
    from collections import Counter

    gold_counts = Counter(gold_tokens)
    gold_norm = sum(v * v for v in gold_counts.values()) ** 0.5
    toks = tokens(F.col(text))
    uniq = F.array_distinct(toks)
    dot = F.aggregate(
        F.transform(
            uniq,
            lambda v: F.size(F.filter(toks, lambda x: x == v))
            * F.coalesce(
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in gold_counts.items() for x in kv]
                    ),
                    v,
                ),
                F.lit(0),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    doc_norm = F.sqrt(
        F.aggregate(
            F.transform(
                uniq,
                lambda v: F.pow(F.size(F.filter(toks, lambda x: x == v)), 2),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sim = F.when(
        (doc_norm > 0) & F.lit(gold_norm > 0), dot / (doc_norm * F.lit(float(gold_norm)))
    ).otherwise(F.lit(0.0))
    return docs.withColumn(out_col, sim)
