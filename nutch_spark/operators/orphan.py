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
    # dot product only needs the GOLD terms — O(gold x tokens), linear in
    # the document (never the per-distinct-token quadratic scan)
    def _eq(term: str):
        # NB: a 2-arg lambda would be read by Spark as (element, index)
        return lambda x: x == F.lit(term)

    dot = None
    for term, weight in sorted(gold_counts.items()):
        part = F.size(F.filter(toks, _eq(term))) * weight
        dot = part if dot is None else dot + part
    # sum of squared term counts in ONE pass over the sorted array
    # (run-length walk), instead of counting each distinct token separately
    def _state(prev, run, sq):
        # named_struct keeps field names stable inside the lambda (plain
        # struct() aliases are rewritten to col1/col2/... there)
        return F.named_struct(
            F.lit("prev"), prev, F.lit("run"), run, F.lit("sq"), sq
        )

    zero = _state(F.lit(""), F.lit(0).cast("long"), F.lit(0).cast("long"))
    sumsq = F.aggregate(
        F.array_sort(toks),
        zero,
        lambda acc, x: _state(
            x,
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            F.when(x == acc["prev"], acc["sq"]).otherwise(
                acc["sq"] + acc["run"] * acc["run"]
            ),
        ),
        lambda acc: acc["sq"] + acc["run"] * acc["run"],
    )
    doc_norm = F.sqrt(sumsq.cast("double"))
    sim = F.when(
        (doc_norm > 0) & F.lit(gold_norm > 0), dot / (doc_norm * F.lit(float(gold_norm)))
    ).otherwise(F.lit(0.0))
    return docs.withColumn(out_col, sim)
