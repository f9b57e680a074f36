"""Skew-mitigation joins: explicit salting.

AQE's skew-join handles moderate skew by splitting oversized shuffle
partitions, but it only triggers on sort-merge joins and after-the-fact
statistics; a key carrying 30% of a 100 TB fact still lands on one
task first. Explicit salting bounds the worst task a priori: the big
side scatters each hot key across ``n_salt`` sub-keys, the small side
replicates ``n_salt``× (it's small — that's the deal), and the join key
becomes (key, salt).

The salt must be *uniform per big-side row* but carries no semantics —
crc32 of a per-row fingerprint keeps it deterministic across retries
(rand() would re-roll under task re-execution, which is fine for
inner joins but not for observability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    ``n_salt`` ways. Output columns match ``big.join(small, on, how)``.

    Join types that preserve unmatched BIG rows (inner/left/semi/anti)
    are safe: every big row carries exactly one salt. right/full would
    emit each unmatched SMALL key once per salt replica — rejected.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
            "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join supports {sorted(safe)}; '{how}' would duplicate "
            "unmatched small-side keys across salt replicas"
        )
    salt = F.pmod(
        F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in big.columns])),
        F.lit(n_salt),
    ).cast("int")
    big_s = big.withColumn(SALT_COL, salt)
    # (generators can't nest inside other expressions — explode bare,
    # the sequence elements are already int)
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return big_s.join(small_s, [on, SALT_COL], how).drop(SALT_COL)
