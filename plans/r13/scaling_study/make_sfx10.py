"""Build a 10x-replicated sf0.1 twin (key-shifted so ids stay unique)
for the builder-side scaling sweep (verdict item 7). Deterministic.

Writes /tmp/sfx10/{documents,lineitem,part,supplier,nation,region,
customer,orders,events,embeddings}.parquet — replicated tables get 10
key-shifted copies written as 10 files; dimension-ish tables are
copied verbatim so joins keep their shape.
"""
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from finalpipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
COPIES = 10

# key columns to shift per replicated table (offset = k * 10**9)
SHIFT = {
    "documents": ["doc_id"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
}
VERBATIM = ["supplier", "nation", "region", "customer"]


def main():
    spark = get_spark(app_name="make-sfx10")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in VERBATIM:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print("copied", t, flush=True)
    for t, keys in SHIFT.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        cols = {c for c in src.columns}
        missing = [k for k in keys if k not in cols]
        if missing:
            print(f"skip shift cols {missing} on {t}")
        parts = []
        for k in range(COPIES):
            df = src
            for key in keys:
                if key in cols:
                    df = df.withColumn(
                        key, F.col(key) + F.lit(k * 10**9).cast("long")
                    )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print("replicated", t, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
