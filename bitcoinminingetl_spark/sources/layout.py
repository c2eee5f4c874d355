"""Multi-dimensional data layout: z-order (Morton-interleaved) file
clustering for parquet tables.

Why: date-partitioning (sink.py) prunes one dimension. When queries
filter on several columns (user_id AND value, lat AND lon), sorting by
any single column destroys locality in the others. Interleaving the
bits of per-column ranks gives every file a tight min/max envelope in
ALL clustered columns at once, so parquet footer statistics prune files
and row groups for filters on any of them — the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain DataFrame ops.

At 100 TB: the range computation is one tiny agg; the z-value is a
scalar codegen expression; `repartitionByRange(z)` is the one (sorted)
shuffle and doubles as the file-sizing knob. Layout cost amortizes over
every subsequent multi-predicate scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 8  # rank resolution per column: 256 buckets


def _scaled_rank(col: Column, lo: float, hi: float) -> Column:
    """Map col into [0, 2^_BITS) by min/max scaling (NULLs -> bucket 0,
    sorting them together at the low edge)."""
    if hi <= lo:  # constant column — everything in one bucket
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * ((1 << _BITS) - 1)
    return F.coalesce(F.round(scaled).cast("long"), F.lit(0))


def z_value(ranks: list[Column]) -> Column:
    """Morton code: interleave the _BITS bits of each rank column.
    Pure bit arithmetic (shift/and/or) — whole-stage codegen, no UDF."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for bit in range(_BITS):
        for ci, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, bit).bitwiseAND(F.lit(1)), bit * n + ci
                )
            )
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    1. one aggregate computes each column's (min, max) — a scalar
       collect, the only driver round-trip;
    2. every row gets a z-value from its interleaved scaled ranks;
    3. ``repartitionByRange(n_files, z)`` + sort-within-partitions puts
       contiguous z ranges in each file AND orders row groups inside it,
       so both file-level and row-group-level min/max stats stay tight.
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    ranks = [
        _scaled_rank(F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"]) for c in cols
    ]
    (
        df.withColumn("__z", z_value(ranks))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
