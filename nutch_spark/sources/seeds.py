"""Seed-file source (SURVEY.md §2.1 S1).

Reference: /root/reference/src/java/org/apache/nutch/crawl/Injector.java:62-84,
235-258 — one URL per line, optional tab-separated ``key=value`` metadata,
blank lines and ``#`` comments skipped.

Spark: spark.read.text + split/str_to_map — stays fully declarative so the
seed scan can be filtered/pruned like any table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Read seed text file(s) → (url, metadata MAP<STRING,STRING>)."""
    raw = spark.read.text(path)
    return parse_seed_lines(raw, "value")


def parse_seed_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """Parse seed lines already loaded in a DataFrame column."""
    line = F.trim(F.col(col))
    parts = F.split(line, r"\t")
    kvs = F.filter(F.slice(parts, 2, 1 << 20), lambda p: p.contains("="))
    metadata = F.map_from_arrays(
        F.transform(kvs, lambda p: F.trim(F.substring_index(p, "=", 1))),
        F.transform(kvs, lambda p: F.trim(F.substring_index(p, "=", -1))),
    )
    return (
        df.filter((line != "") & ~line.startswith("#"))
        .select(
            F.element_at(parts, 1).alias("url"),
            metadata.alias("metadata"),
        )
        .filter(F.col("url") != "")
    )
