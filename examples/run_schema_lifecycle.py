"""Demo: the table format's schema lifecycle — evolution, the
manifest-recorded logical schema, write-side type safety, and
schema-complete pruned reads.

The production story this models: a lake table ingested by many
writers over years. Columns get added (evolution), batches arrive
typed slightly differently (a CDC literal lands as int where the
table holds bigint), and occasionally a writer ships a genuinely
drifted batch (double where the table holds bigint). The contract:

- evolution goes through append and is FREE — old files are never
  rewritten, the manifest records the union schema at commit time;
- readers resolve the schema from ONE manifest read (no mergeSchema
  footer sweep — at 100 TB that sweep is tens of thousands of
  object-store GETs serialized in the planner);
- pruned reads return the FULL table schema even when every kept
  file predates the evolution (NULL-filled) — identical to
  read().filter(...);
- lossless widenings cast to the table's type on write; real drift
  fails LOUDLY with nothing staged — a drifted batch can never brick
  reads;
- a full rewrite (compact) re-baselines everything onto one schema.

    python examples/run_schema_lifecycle.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.session import build_session
from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable


def main() -> None:
    workdir = (
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="schema_")
    )
    spark = build_session("schema-lifecycle-demo")
    t = ManifestTable(f"{workdir}/events", stat_cols=("id",))

    # v0: the original shape
    t.overwrite(
        spark.range(0, 1000).select("id", (F.col("id") * 2).alias("score"))
    )
    print(f"v0 columns: {t.read(spark).columns}")

    # v1: EVOLUTION — a new column arrives via append; no rewrite
    t.append(
        spark.range(1000, 2000).select(
            "id", (F.col("id") * 2).alias("score"), F.lit("mobile").alias("src")
        )
    )
    m = t._manifest(spark, t.current_version(spark))
    print(
        f"v1 evolved={m.get('evolved')} — schema recorded in manifest: "
        f"{'schema' in m} (readers never sweep footers)"
    )

    # pruned read over a range held ONLY by pre-evolution files:
    # still schema-complete — 'src' NULL-fills
    pruned = t.read_where(spark, "id", 100, 200)
    print(
        f"pruned read columns {pruned.columns}, "
        f"src all-null: {pruned.filter(F.col('src').isNotNull()).count() == 0}"
    )

    # v2: a batch typed narrow (int where the table holds bigint) —
    # lossless widening casts on write, the table's type is stable
    t.append(
        spark.range(2000, 2100).select(
            "id",
            (F.col("id") * 2).cast("int").alias("score"),
            F.lit("api").alias("src"),
        )
    )
    print(f"after widened append, score type: {dict(t.read(spark).dtypes)['score']}")

    # a genuinely drifted batch: fails loudly, nothing staged
    try:
        t.append(
            spark.range(0, 10).select(
                "id", (F.col("id") * 0.5).alias("score"), F.lit("x").alias("src")
            )
        )
    except ValueError as e:
        print(f"drifted batch rejected: {str(e)[:88]}...")

    # CDC upsert against the evolved table: a pre-evolution writer
    # (no 'src' column) is tolerated — absent columns land NULL
    t.merge(
        spark.range(0, 5).select("id", (F.col("id") * 100).alias("score")),
        "id",
    )
    print(f"post-merge rows: {t.read(spark).count()}")

    # compact re-baselines: one homogeneous schema, flags clear
    v = t.compact(spark, target_files=2)
    mc = t._manifest(spark, v)
    print(
        f"after compact: evolved={'evolved' in mc}, "
        f"schema recorded={'schema' in mc}, rows={mc['rows']}"
    )

    # time travel still shows v0's narrow schema
    print(f"v0 via time travel: {t.read(spark, version=0).columns}")
    spark.stop()


if __name__ == "__main__":
    main()
