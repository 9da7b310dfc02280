"""Query plans for the driver's correctness/bench harness.

Importing this package populates REGISTRY with every declared query
(name -> (spark_fn, oracle_sql | None)).
"""

from nutch_spark.plans.driver_queries import REGISTRY

from nutch_spark.plans import coverage_queries  # noqa: E402,F401  (registers a10/d2/d4/d5/d8/f2)
from nutch_spark.plans import datapipe_queries  # noqa: E402,F401  (registers dp_*)
from nutch_spark.plans import graph_queries  # noqa: E402,F401  (registers g/j/w/st_*)
from nutch_spark.plans import scalar_queries  # noqa: E402,F401  (registers f1/d7_*)

__all__ = ["REGISTRY"]
