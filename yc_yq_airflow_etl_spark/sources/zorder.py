"""Z-order (Morton) clustering for multi-column data skipping.

The lake's zone maps (sorted writes, sources/lake.py) skip row groups
on ONE leading column; a filter on any other column still scans
everything. Z-ordering interleaves the bits of several columns into a
single sort key, so each written file covers a small HYPER-RECTANGLE
of the key space — min/max parquet statistics become selective for
EVERY participating column at once. This is the same clustering
Delta's OPTIMIZE ZORDER BY applies before the same parquet stats
machinery; no reader-side change is needed.

Built entirely from JVM bitwise expressions (shift/and/or inside
whole-stage codegen) — the key for a 2-column × 16-bit layout is ~64
fused expression nodes, no Python in the path. The only driver-side
step is one tiny min/max aggregate to fix the scaling domain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
) -> Column:
    """The Morton key: each column is scaled to ``bits`` fixed-point
    bits over its [min, max] domain (clamped), then the columns' bits
    are interleaved — bit b of column i lands at position
    ``b * n_cols + i``."""
    n = len(cols)
    top = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        norm = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * top
        scaled.append(
            F.least(F.lit(top), F.greatest(F.lit(0), norm.cast("long")))
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Land df as ``num_files`` parquet files clustered by the Z-order
    of ``cols``: range-partition on the key (even file sizes), sort
    within each partition (tight row-group stats), write. One extra
    shuffle versus a plain write — paid once at write time, repaid on
    every multi-column-filtered scan."""
    cols = list(cols)
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [stats[f"_lo{i}"] for i in range(len(cols))]
    maxs = [stats[f"_hi{i}"] for i in range(len(cols))]
    key = zorder_key(cols, mins, maxs, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
