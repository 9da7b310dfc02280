"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Generator-selection query (SURVEY.md §3.1)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose the operator inventory
registry from ``nutch_spark.plans.driver_queries`` — one entry per implemented
SURVEY.md §2 operator, each paired with a DuckDB oracle where the semantics
are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nutch_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Generator selection (SURVEY.md W1, crawl/Generator.java:579-619):
    per-group top-k by score, then global top-N — the reference's central
    "which URLs do we fetch next" query re-expressed as window + limit.
    """
    fn, _ = REGISTRY["w1_generate_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted where not SQL-expressible."""
    return {
        name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None
    }
