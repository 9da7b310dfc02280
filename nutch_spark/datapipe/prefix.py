"""Distributed global rank + prefix sum — the scale-safe replacement for
an unpartitioned window.

``Window.orderBy(...)`` with no ``partitionBy`` is the one window shape
that does NOT scale: Spark moves EVERY row into a single partition and
one task sorts and scans the lot (it even logs a warning). Global ranks
and running totals don't need that: a range-partitioned sort already
puts rows in globally ordered, non-overlapping partitions, so

  global_rank  = (rows in earlier partitions)       + local rank
  global cumsum = (value sum of earlier partitions) + local cumsum

— the classic two-pass distributed prefix sum. Pass 1 aggregates one
(count, sum) row per partition (collected to the driver: ≤ n_partitions
rows, constant per cluster); pass 2 is per-partition windows plus a
broadcast join of the offsets. Values are EXACTLY those of the
single-partition window (ranks/cumsums depend only on the total order,
not on where range boundaries land), which is what the tests assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value: str,
    *,
    rank_col: str = "rank",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` (1-based global row_number under ``order_by``)
    and ``cum_col`` (running sum of ``value`` up to and including the
    row) WITHOUT a single-partition window.

    ``order_by`` must be a TOTAL order (include a unique tie-break):
    equal keys may straddle a range boundary, which would make ranks
    partition-dependent. The helper is exact, deterministic, and
    partitioning-independent for total orders.

    ``value`` must be non-null integral (counts/token totals — the
    prefix-sum use cases); the offset pass sums it per partition.
    Recompute safety: pass 2 re-executes the range partitioning that
    pass 1 measured — RangePartitioner's bound sampling is seeded per
    partition index over the same input lineage, so both jobs see
    identical boundaries; on a real cluster, `.persist()` the input
    before calling when the lineage contains nondeterministic stages."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    local = ranged.withColumn("_lrank", F.row_number().over(w)).withColumn(
        "_lcum",
        F.sum(F.col(value)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # pass 1: one (count, sum) row per partition -> driver -> running
    # offsets. <= n rows regardless of data size.
    parts = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_s"))
        .collect()
    )
    offsets, rows_before, sum_before = [], 0, 0
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], rows_before, sum_before))
        rows_before += r["_n"]
        sum_before += r["_s"] or 0
    odf = spark.createDataFrame(
        offsets, "_pid int, _rows_before long, _sum_before long"
    )
    return (
        local.join(F.broadcast(odf), "_pid")
        .withColumn(rank_col, (F.col("_rows_before") + F.col("_lrank")).cast("int"))
        .withColumn(cum_col, F.col("_sum_before") + F.col("_lcum"))
        .drop("_pid", "_lrank", "_lcum", "_rows_before", "_sum_before")
    )
