"""Checkpoint-generation hygiene for iterative DataFrame loops.

Every bounded-iteration operator here (connected components, PageRank)
must ``localCheckpoint`` each round's state — plan truncation is what
keeps round k's logical tree from embedding round k-1's — but
checkpoint blocks are NOT freed by ``DataFrame.unpersist()``: the data
lives in the checkpointed RDD's storage, outside the CacheManager. An
iterative loop that never frees superseded generations keeps EVERY
round's O(V) state resident until JVM GC happens to collect the
dereferenced frames — at scale, that is the loop's memory ceiling.

These helpers implement the explicit handoff: capture the persisted
RDD id behind a checkpointed frame, and free it the moment the NEXT
generation has materialized and the old one has served its last read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def checkpointed_rdd_id(df: DataFrame) -> int | None:
    """The persisted RDD backing a localCheckpoint'd frame: its
    analyzed plan is a LogicalRDD wrapping exactly the RDD that
    localCheckpoint persisted. Returns None if the plan shape differs
    (Spark version drift) — callers then leak one generation rather
    than risk freeing someone else's RDD."""
    try:
        return int(df._jdf.queryExecution().analyzed().rdd().id())
    except Exception:
        return None


def free_checkpoint(spark: SparkSession, rdd_id: int | None) -> None:
    """Unpersist the checkpointed RDD by id, if it is still
    registered. Safe on None and on already-freed ids."""
    if rdd_id is None:
        return
    jm = spark.sparkContext._jsc.getPersistentRDDs()
    if jm.containsKey(rdd_id):
        jm.get(rdd_id).unpersist(False)
