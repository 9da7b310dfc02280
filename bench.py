"""Benchmark harness: runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a noop-format write (full execution, no driver
collect) so the timing reflects the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nutch_spark.plans import REGISTRY
from nutch_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("nutch_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # Warm the JVM/parquet-footer caches once so per-query numbers measure the
    # plan, not first-touch class loading.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    for name, (fn, _oracle) in REGISTRY.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    summary = json.dumps(
        {
            "metric": "nutch_spark operator inventory wall-clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # Stop Spark BEFORE printing so no executor/log output can interleave
    # with (or truncate) the summary; the JSON must be the last stdout line.
    spark.stop()
    sys.stderr.flush()
    print(summary, flush=True)


if __name__ == "__main__":
    main()
