"""Lineage truncation with a reliability switch.

The iterative and two-phase operators (label-propagation clustering,
the global-rank family) truncate lineage after each pinned step —
without it, the sampled range boundaries of ``repartitionByRange`` (or
an iteration's join tree) would be recomputed, and possibly re-sampled
differently, every time the result is consumed.

``localCheckpoint`` is the right default on a healthy cluster: no
extra I/O beyond executor-local block storage.  But executor-local
blocks are NOT fault-tolerant — on a real multi-node cluster with node
churn, losing one executor loses its blocks and kills every job whose
lineage was truncated there (correctness is never at risk; availability
is).  For long 100 TB jobs, set

    spark.conf.set("spark.finalpipeline.checkpointDir", "hdfs://.../ckpt")

and every operator that routes through :func:`truncate_lineage`
switches to RELIABLE checkpoints under that directory, which survive
executor loss (Spark re-reads the checkpoint files instead of
recomputing lost lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CONF_KEY = "spark.finalpipeline.checkpointDir"


def truncate_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` — or a reliable ``df.checkpoint``
    when the session sets ``spark.finalpipeline.checkpointDir``."""
    spark = df.sparkSession
    ckpt_dir = spark.conf.get(_CONF_KEY, None)
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    # setCheckpointDir mints a fresh UUID subdirectory per call — set
    # it once per session, not per truncation
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)
