"""Skew mitigation: key salting for aggregations and joins.

AQE's skew-join splitting handles sort-merge join skew at runtime,
but two shapes still need explicit salting at scale:

- **hot-key aggregation**: one key holding 10% of a 100 TB fact table
  lands on one reducer. Two-phase salted aggregation splits the key
  into N shards, partially aggregates, then merges.
- **hot-key join against a non-broadcastable side**: salt the skewed
  (probe) side N ways and explode the build side N times, turning one
  straggler partition into N even ones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase count per key: phase 1 aggregates (key, salt) —
    spreading any hot key over ``salt_buckets`` reducers — phase 2
    merges the partial counts per key. Result ≡ groupBy(keys).count()."""
    keys = list(keys)
    salted = df.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("cnt"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is too
    large to broadcast outright but small enough to replicate
    ``salt_buckets`` times: each skewed row gets a random salt, each
    small row is exploded once per salt value, and the join key
    becomes (key, salt) — hot keys now spread over ``salt_buckets``
    partitions. Row multiplicity is preserved exactly (each skewed row
    matches the single replica carrying its salt)."""
    skewed_s = skewed.withColumn(
        "_salt", (F.rand(seed=11) * salt_buckets).cast("int")
    )
    small_r = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = skewed_s.join(small_r, on=[on, "_salt"], how=how)
    return out.drop("_salt")
