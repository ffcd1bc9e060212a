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

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


def _finite_only(d: Column) -> Column:
    """NULL out NaN/±Inf so min/max aggregates see only finite values.

    Spark's plain ``max()`` returns NaN whenever ANY value is NaN
    (NaN sorts greatest), so one NaN row poisons the whole scaling
    domain: ``span`` becomes NaN, the normalized key is NaN for EVERY
    row, and ``cast("long")`` throws CAST_OVERFLOW under ANSI (the
    engine default) or silently collapses the column's key bits to a
    constant under ANSI-off — de-clustering the table. Same family as
    the read-path rule "a NaN bound is an unusable proof" (invariant
    #29); this is its write-path sibling (invariant #30)."""
    return F.when(~F.isnan(d) & (F.abs(d) != F.lit(_INF)), d)


def zorder_key(
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
) -> Column:
    """The Morton key: each column is scaled to ``bits`` fixed-point
    bits over its [min, max] domain (clamped), then the columns' bits
    are interleaved — bit b of column i lands at position
    ``b * n_cols + i``.

    ``bits`` is automatically lowered so the TOP interleaved position
    (``bits * n_cols - 1``) stays below the long's sign bit: position
    63 would flip the key negative for half the leading column's
    domain (negative longs sort first — curve order broken), and Java
    shifts wrap mod 64, so positions ≥64 would OR high bits onto low
    positions and collide unrelated cells. 16 bits/col up to 3 cols,
    15 at 4, 12 at 5, …; >63 columns cannot interleave at all."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    for c, lo, hi in zip(cols, mins, maxs):
        if not (math.isfinite(lo) and math.isfinite(hi)):
            # a NaN/Inf bound poisons span → every row's key, not just
            # the bad row's (invariant #30) — refuse naming the column
            raise ValueError(
                f"cannot z-order on {c!r}: non-finite domain bound "
                f"[{lo}, {hi}] — exclude NaN/Inf from the domain "
                "aggregates (write_zordered/cluster do) or drop the "
                "column from cols"
            )
    bits = min(bits, 63 // n)
    if bits < 1:
        raise ValueError(
            f"cannot z-order {n} columns: even 1 bit per column "
            "overflows a 64-bit key — z-order on a subset"
        )
    top = (1 << bits) - 1
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) or 1.0
        raw = F.col(c).cast("double")
        norm = (raw - F.lit(float(lo))) / F.lit(span) * top
        # Clamp in DOUBLE space BEFORE the long cast: a row outside
        # the (finite) domain — +Inf, or a value that overflows the
        # scale — clamps to [0, top] instead of throwing CAST_OVERFLOW
        # under ANSI. NaN rows can't be clamped (NaN survives
        # least/greatest per Spark's NaN-greatest ordering), so they
        # are routed EXPLICITLY to the top bucket, mirroring how Spark
        # sorts NaN last and how the stats convention treats NaN
        # (invariant #29/#30). NULL rows keep landing in bucket 0
        # (greatest(0.0, NULL) = 0.0), as before.
        clamped = F.least(
            F.lit(float(top)), F.greatest(F.lit(0.0), norm)
        ).cast("long")
        scaled.append(
            F.when(F.isnan(raw), F.lit(top).cast("long")).otherwise(clamped)
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
    from .._reserved import reserve_tags

    cols = list(cols)
    # withColumn would silently REPLACE the user's column and the
    # final drop would erase it from the written data
    reserve_tags("write_zordered", df.columns, "_zkey")
    # NaN/Inf are EXCLUDED from the domain (invariant #30): one NaN
    # value would make max() NaN and poison the scaling for every row
    # — CAST_OVERFLOW under the default ANSI session, silent
    # de-clustering under ANSI-off. Non-finite rows still land: NaN
    # routes to the top bucket, ±Inf clamps to the domain edges
    # (see zorder_key).
    stats = df.agg(
        *[
            F.min(_finite_only(F.col(c).cast("double"))).alias(f"_lo{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(_finite_only(F.col(c).cast("double"))).alias(f"_hi{i}")
            for i, c in enumerate(cols)
        ],
    ).first()
    mins = [stats[f"_lo{i}"] for i in range(len(cols))]
    maxs = [stats[f"_hi{i}"] for i in range(len(cols))]
    if any(m is None for m in mins):
        # None min/max = empty input or a column with no finite value
        # (all NULL, or all NaN/Inf — which sails past a plain NULL
        # check); the key arithmetic would die on None operands with
        # an opaque TypeError deep in zorder_key
        if df.isEmpty():
            # an empty slice is routine (per-partition backfills):
            # land the empty-but-schema'd output instead of crashing
            df.write.mode("overwrite").parquet(path)
            return
        bad = [c for c, m in zip(cols, mins) if m is None]
        raise ValueError(
            f"write_zordered: column(s) {bad} are entirely NULL or "
            "non-finite (NaN/Inf) — a column with no finite domain "
            "cannot participate in the Z-order key (drop it from "
            "cols or filter the input)"
        )
    key = zorder_key(cols, mins, maxs, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
