"""nutch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/nutch.

The reference (/root/reference, apache-nutch 1.23-SNAPSHOT) is a chain of
Hadoop MapReduce jobs over keyed tables (CrawlDb, LinkDb, HostDb, WebGraph,
segments).  Here every store is a Parquet-backed DataFrame and every job is a
pure DataFrame transformation, declared through the DataFrame/SQL API so that
Catalyst gets to do predicate pushdown, column pruning, partial aggregation
and join planning.  Nothing in this package uses RDDs; imperative logic
(fetching, parsing) is isolated behind mapInPandas/applyInPandas.

Layout
------
- ``session``    SparkSession factory with scale-oriented defaults
- ``schemas``    StructTypes for crawldb / linkdb / hostdb / segments / webgraph
- ``config``     engine configuration (mirrors conf/nutch-default.xml knobs)
- ``functions``  scalar expression library (URL parts, signatures, dates, JEXL)
- ``operators``  one module per reference job family (SURVEY.md §2)
- ``sources``    seed-file reader and CSV/JSON/text sinks
- ``datapipe``   LLM-training-data operators (dedup, similarity, text stats)
- ``streaming``  Structured Streaming crawl-frontier surface (net-new)
"""

__version__ = "0.1.0"
