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

# Ship this package's functions BY VALUE inside pickled UDF closures
# (mapInPandas fetch/decode). Without this, Spark's Python workers resolve
# closures by module reference and fail with ModuleNotFoundError whenever the
# package is importable on the driver (sys.path / notebook) but not installed
# on the workers — the common case for a repo-checkout deployment. With it,
# `spark-submit --py-files` becomes optional instead of mandatory.
try:  # pragma: no cover - depends on the vendored cloudpickle version
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; --py-files still works
    pass
