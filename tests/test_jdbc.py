"""JDBC source/sink integration (sources/jdbc.py), exercised against a
real database over a real JDBC driver: DuckDB's public JDBC jar
(org.duckdb:duckdb_jdbc) when one is present on this machine.

The reference's primary at-rest store was a SQL database over a DB-API
driver (db_interact.py); read_jdbc/write_jdbc are the Spark-first
equivalent. A JDBC driver jar must be on the Spark DRIVER classpath at
JVM start (spark.jars), which the shared session fixture cannot
provide — so the integration runs in a SUBPROCESS with its own
SparkSession, and this module skips cleanly when no jar is found
(the capability gate's NotImplementedError path stays covered by the
gate's message contract)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _find_jar() -> str | None:
    for root in ("~/.cache", "~/.ivy2", "/opt"):
        hits = glob.glob(
            os.path.join(os.path.expanduser(root), "**", "duckdb_jdbc*.jar"),
            recursive=True,
        )
        if hits:
            return hits[0]
    return None


_JAR = _find_jar()

_SCRIPT = r"""
import sys
jar, db = sys.argv[1], sys.argv[2]
import duckdb
con = duckdb.connect(db)
con.execute(
    "create or replace table src as "
    "select cast(range as bigint) as id, 'v' || range as payload "
    "from range(1000)"
)
con.close()

from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]").appName("jdbc-it")
    .config("spark.jars", jar)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
sys.path.insert(0, ".")
from finalpipeline_spark.sources.jdbc import read_jdbc, write_jdbc

url = f"jdbc:duckdb:{db}"
props = {"driver": "org.duckdb.DuckDBDriver"}

# S4: SELECT -> DataFrame
df = read_jdbc(spark, url, "src", properties=props)
assert df.count() == 1000, df.count()

# S9: range-partitioned parallel scan — N concurrent range predicates,
# not LIMIT/OFFSET pagination (the reference's broken paginator)
part = read_jdbc(
    spark, url, "src",
    partition_column="id", lower_bound=0, upper_bound=1000,
    num_partitions=4, properties=props,
)
assert part.rdd.getNumPartitions() == 4, part.rdd.getNumPartitions()
assert sorted(r["id"] for r in part.collect()) == list(range(1000))

# pushdown subquery (derived-table scan, the join-pushdown pattern)
sub = read_jdbc(
    spark, url, '(select id from src where id < 10) t', properties=props
)
assert sub.count() == 10

# S2/S5: batched write, then read back through the database itself.
# (Table pre-created: Spark's overwrite DDL path DROPs/CREATEs through
# a separate connection, which DuckDB's single-writer JDBC driver
# rejects — the path under test is write_jdbc's batched INSERT.)
con = duckdb.connect(db)
con.execute("create table dst (id bigint, payload varchar)")
con.close()
out = spark.range(0, 50).selectExpr("id", "concat('w', id) as payload")
write_jdbc(out, url, "dst", mode="append", properties=props)
spark.stop()
con = duckdb.connect(db)
n, = con.execute("select count(*) from dst").fetchone()
assert n == 50, n
con.close()
print("JDBC_IT_OK")
"""


@pytest.mark.skipif(_JAR is None, reason="no duckdb_jdbc jar on this machine")
def test_jdbc_roundtrip_partitioned_read_and_batched_write(tmp_path):
    db = str(tmp_path / "it.db")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, _JAR, db],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "JDBC_IT_OK" in proc.stdout


def test_jdbc_gate_message_without_driver(spark, tmp_path):
    """Without the matching driver jar on the classpath, the failure is
    the documented NotImplementedError naming the fix — never an opaque
    ClassNotFoundException. (The shared test session has no JDBC jars,
    so this exercises the real gate.)"""
    from finalpipeline_spark.sources.jdbc import read_jdbc

    with pytest.raises(NotImplementedError, match="driver jar"):
        read_jdbc(spark, "jdbc:postgresql://localhost:5/x", "t").count()
