"""Sinks (SURVEY.md §2.1 S3–S6).

Reference:
- CSV dump:  /root/reference/src/java/org/apache/nutch/crawl/CrawlDbReader.java:160-256
- JSONL dump: CrawlDbReader.java:258-369 (typed metadata serialization → to_json)
- text dump: segment/SegmentReader.java:113-199
- IndexWriter fan-out: indexer/IndexWriters.java + src/plugin/indexer-*
  (Solr/ES/Kafka/...). Here: a sink registry routed through foreachBatch so
  external writers plug in without touching operator code; CSV/JSON writers
  are Spark-native.

Binary columns are hex-encoded for CSV (the reference prints signatures as
hex, CrawlDbReader.java via StringUtil.toHexString).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_for_text(df: DataFrame) -> DataFrame:
    """Hex binaries, json-encode maps/arrays so csv/text formats accept them."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            out = out.withColumn(f.name, F.lower(F.hex(F.col(f.name))))
        elif isinstance(f.dataType, (T.MapType, T.ArrayType, T.StructType)):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S3 — CrawlDb dump as CSV with header. RFC 4180 quoting (escape a
    quote by doubling it) rather than Spark's backslash default: the
    reference dumps through commons-csv, and every standard reader
    (DuckDB, Excel, csv.reader) expects doubled quotes — the json-encoded
    metadata column is full of quotes, so this matters in practice."""
    (
        _flatten_for_text(df)
        .write.mode(mode)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S4 — JSON-lines dump (maps serialize natively, matching the typed
    metadata serialization of CrawlDbReader.java:340-368)."""
    df.write.mode(mode).json(path)


def write_text_dump(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S5 — pretty text dump: one 'col: value' block per row."""
    flat = _flatten_for_text(df)
    line = F.concat_ws(
        "\n", *[F.concat(F.lit(f"{c}: "), F.coalesce(F.col(c).cast("string"), F.lit(""))) for c in flat.columns]
    )
    flat.select(line.alias("value")).write.mode(mode).text(path)


# --- S6: pluggable index writers -------------------------------------------

SinkFn = Callable[[DataFrame], None]
_SINKS: dict[str, SinkFn] = {}


def register_sink(name: str, fn: SinkFn) -> None:
    """Register an external index writer (Solr/ES/Kafka equivalents).

    Writers receive the ADD/DELETE document DataFrame of one batch; inside
    they may use df.write.format(...) or foreachPartition. Mirrors
    indexer/IndexWriters.java's plugin registry."""
    _SINKS[name] = fn


def route_to_sinks(df: DataFrame, *, condition: str | None = None) -> None:
    """Exchange-style routing (src/plugin/exchange-jexl): send the batch to
    every registered sink, optionally pre-filtered by a SQL condition."""
    batch = df.filter(F.expr(condition)) if condition else df
    for fn in _SINKS.values():
        fn(batch)
