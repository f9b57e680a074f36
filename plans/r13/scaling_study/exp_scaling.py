"""Builder-side scaling sweep (verdict item 7): 5 expensive queries on
the 10x key-shifted sf0.1 twin, 8 vs 32 cores, interleaved windows.

Run as: SPARK_GRAFT_CPUS=32 python /tmp/exp_scaling.py
        SPARK_GRAFT_CPUS=8  python /tmp/exp_scaling.py
(one process per core count — master is fixed at session creation).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from finalpipeline_spark.queries.registry import load_all
from finalpipeline_spark.session import get_spark

SF = "/tmp/sfx10"
QUERIES = [
    "tpch_q1", "flagship_datamart_chain", "doc_corpus_curation",
    "doc_tfidf_topterms", "doc_quality_score",
]


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    spark = get_spark(app_name=f"r13-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = load_all()
    results = {}
    for w in range(3):
        for n in QUERIES:
            spark.sparkContext.setJobDescription(f"{n}@{cpus}c w{w}")
            t0 = time.perf_counter()
            specs[n].fn(spark, SF).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            results.setdefault(n, []).append(round(dt, 3))
            print(f"w{w} {n}: {dt:.3f}", flush=True)
    print(f"CPUS={cpus} BEST:", {n: min(v) for n, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
