"""Z-order (Morton-curve) clustering for multi-column data skipping.

Sorting a table by one column gives perfect file-level min/max pruning
on that column and none on any other. Interleaving the bits of several
columns into one Morton code and range-partitioning + sorting by it
gives every interleaved column *locality* in every file — each file
covers ~2^(-bits/k) of each column's range — so min/max skipping works
for predicates on ANY of them. This is what table formats call
OPTIMIZE ZORDER; here it is plain Spark: an integer expression, a
repartitionByRange, a sortWithinPartitions.

Everything is JVM-side integer arithmetic (shiftright/&/sum) — no UDF,
no shuffle beyond the single range exchange the rewrite needs anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-normalize a numeric column onto [0, 2^bits - 1]."""
    span = (hi - lo).cast("double")
    unit = (col.cast("double") - lo.cast("double")) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(unit * (1 << bits)).cast("long"), top.cast("long"))


def _interleave(scaled: Sequence[Column], bits: int) -> Column:
    """Morton code: bit j of column i lands at position j*k + i."""
    k = len(scaled)
    z = F.lit(0).cast("long")
    for i, c in enumerate(scaled):
        for j in range(bits):
            z = z + F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * k + i)
    return z


def zorder_write_parquet(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    num_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` into ``num_files`` parquet files clustered along
    the Morton curve of ``cols``.

    Column ranges come from one tiny agg (computed once, broadcast as
    literals via a scalar subquery join — at 100 TB this is the same
    stats pass OPTIMIZE runs). The range exchange on the z-value is the
    only shuffle; the within-partition sort makes parquet row-group
    min/max tight too, not just file min/max.

    ``bits`` is clamped so the whole code fits the 63 usable bits of a
    signed long — beyond that the interleave would hit the sign bit
    (breaking sort order) or wrap the shift mod 64 (colliding codes).
    """
    zorder_cluster(df, cols, num_files, bits).write.mode("overwrite").parquet(path)


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """``df`` re-clustered along the Morton curve of ``cols`` into
    ``num_partitions`` range partitions (see zorder_write_parquet for
    the mechanics) — the writable unit, so any sink (plain parquet,
    VersionedTable.optimize) can apply z-ordering."""
    bits = min(bits, 63 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs)
    with_stats = df.join(F.broadcast(stats))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    z = _interleave(scaled, bits).alias("__z")
    return (
        with_stats.select(*df.columns, z)
        .repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
