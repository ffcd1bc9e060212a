"""Skew mitigation: key salting for aggregations and joins.

AQE's skew-join splitting handles sort-merge join skew at runtime,
but two shapes still need explicit salting at scale:

- **hot-key aggregation**: one key holding 10% of a 100 TB fact table
  lands on one reducer. Two-phase salted aggregation splits the key
  into N shards, partially aggregates, then merges.
- **hot-key join against a non-broadcastable side**: salt the skewed
  (probe) side N ways and replicate the build side N times, turning
  one straggler partition into N even ones. The single implementation
  lives in :func:`..operators.joins.salted_join` (deterministic salt,
  optional hot-key split that bounds build replication to the hot
  slice); this module re-exposes it under the original positional
  signature.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import salted_join as _salted_join_impl


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation per key: phase 1 aggregates
    (key, salt) — spreading any hot key over ``salt_buckets`` reducers
    — phase 2 merges the partials per key. Emits ``cnt`` plus one
    ``sum_<col>`` per entry in ``sum_cols``; sums run as DECIMAL(18,2)
    (algebraic and exact, so partial-then-merge ≡ single-pass for ANY
    salt assignment — a double would drift with summation order).
    Result ≡ ``groupBy(keys).agg(count, sum…)``; the salt is a
    deterministic full-row hash so partial-stage recompute after a
    shuffle-fetch failure reassigns identical salts (byte-identical
    duplicate rows share a salt — the spread still holds whenever a
    hot key's rows differ anywhere)."""
    from .joins import _hashable_type

    if salt_buckets < 1:
        # pmod(x, 0) is DIVIDE_BY_ZERO under the pinned-ANSI session
        # (NULL salts / one-reducer collapse under ANSI-off) — r16
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    keys = list(keys)
    sum_cols = list(sum_cols)
    # same guard as joins.salted_join: xxhash64 rejects MAP-typed
    # inputs (AnalysisException) — hash only the hashable columns;
    # determinism holds because the subset is schema-derived
    hashable = [
        F.col(f.name) for f in df.schema.fields if _hashable_type(f.dataType)
    ] or [F.lit(0)]
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*hashable), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_c"),
        *[
            F.sum(F.col(c).cast("decimal(18,2)")).alias(f"_s_{c}")
            for c in sum_cols
        ],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_c").alias("cnt"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase count per key — :func:`salted_agg` without sums,
    kept under its original name/contract."""
    return salted_agg(df, keys, sum_cols=(), salt_buckets=salt_buckets)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is too
    large to broadcast outright but small enough to replicate
    ``salt_buckets`` times. Thin wrapper over
    :func:`..operators.joins.salted_join` — ONE salting semantics in
    the package: pass ``hot_keys`` (known skewed key values) to salt
    only the hot slice and replicate only its build rows; without it
    the whole build side is replicated ``salt_buckets`` times."""
    return _salted_join_impl(
        skewed, small, [on], how=how, salt=salt_buckets, hot_keys=hot_keys
    )
