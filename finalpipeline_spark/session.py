"""SparkSession factory with scale-oriented defaults.

The reference hand-rolls every physical decision (range-chunked scans,
process pools, join pushdown to Postgres — see SURVEY.md §4); here all
of that is delegated to Catalyst/AQE and we only pin the knobs that
matter at scale: adaptive execution (skew joins, partition coalescing),
Arrow for the pandas-UDF kernels, and a shuffle-partition count sized
to the parallelism actually available.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "finalpipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- adaptive execution: runtime re-planning, skew handling --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing: match local parallelism; AQE coalesces down --
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # -- Arrow transfer for pandas UDFs / toPandas --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- InferFiltersFromGenerate re-inlines the generator's input
        #    expression into an added size(..)>0 filter.  When that input
        #    is a computed chain (tokenize -> hash -> shingle), the filter
        #    copy cannot be CSE'd with the projection copy (fresh lambda
        #    IDs), and predicate pushdown drags the full chain into the
        #    scan filter — measured 11 tokenizer evaluations per row and
        #    18x slowdown on doc_top_ngrams.  The rule only ever SKIPS
        #    empty-array rows the generator would drop anyway, so
        #    excluding it is semantics-preserving at every scale; the
        #    (tiny) scan-prune benefit applies only to stored array
        #    columns, which these pipelines explode rarely and cheaply. --
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # -- deterministic timezone handling (testdata is tz-naive) --
        .config("spark.sql.session.timeZone", "UTC")
        # -- events.parquet stores TIMESTAMP(NANOS): read as epoch-ns long --
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
