"""Change-feed-driven incremental view maintenance.

``plans/analytics.incremental_agg_maintenance`` shows the insert-only
pattern: algebraic partial aggregates fold a delta batch into stored
state by addition. A CDC-mirrored table breaks that — its change feed
carries DELETES (and updates as delete/insert pairs), so the fold
needs RETRACTION: each change contributes with sign +1 (insert) or -1
(delete), and a group whose live count reaches zero leaves the view.
That signed fold is exactly how streaming engines maintain
aggregations over changelogs (Flink's retract streams, Materialize's
differential updates); here it runs as one batch job per consumed
version range.

Scale shape: the maintenance pass aggregates ONLY the change feed —
whose volume ``ManifestTable.table_changes`` already bounds by the
CHURNED files, never the table — then merges with the (group-level,
small) stored state. A 100 TB base with a daily 10 GB churn costs
10 GB per refresh, not 100 TB.

Supported aggregates are the self-decomposable ones (COUNT, SUM, and
anything derivable from them: AVG = SUM/COUNT). MIN/MAX are NOT
retractable from state alone — deleting the current minimum needs the
runner-up, which only the base table knows; views needing them must
recompute their groups (the same restriction every incremental
maintenance engine documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def signed_delta(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Collapse a change feed into per-group signed deltas: count
    delta ``_n`` (+1 per insert, -1 per delete) and one signed sum
    delta per ``sum_cols`` entry. One partial-aggregated shuffle over
    |changes| rows.

    Change types are STRICT (r15 degenerate-input sweep): anything
    other than 'insert'/'delete' fails the job JVM-side naming the
    offending value — a Delta-style 'update_preimage' row silently
    counted as +1 would corrupt the view forever, and a corrupted
    view has no error to trace back."""
    from .._reserved import reserve_tags

    # `_n` is the view's live-count column: a group/sum column with
    # that name would silently collide with it in the fold (r16,
    # same reserved-tag convention as joins/manifest/zorder)
    reserve_tags("signed_delta", [*group_cols, *sum_cols], "_n")
    sign = (
        F.when(F.col(change_type_col) == "delete", F.lit(-1))
        .when(F.col(change_type_col) == "insert", F.lit(1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"signed_delta: unknown {change_type_col} value "
                    ),
                    F.coalesce(
                        F.col(change_type_col), F.lit("NULL")
                    ),
                    F.lit(" — only 'insert'/'delete' are retractable"),
                )
            ).cast("int")
        )
    )
    return changes.groupBy(*group_cols).agg(
        F.sum(sign).cast("bigint").alias("_n"),
        *[
            F.sum(F.col(c).cast("decimal(28,2)") * sign).alias(c)
            for c in sum_cols
        ],
    )


def fold_changes_into_view(
    state: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Merge a change feed into a stored aggregate view.

    ``state`` must carry ``group_cols``, a bigint ``_n`` (live row
    count per group) and DECIMAL sums named after ``sum_cols`` — the
    exact frame this function returns, so refreshes chain:
    ``v2_state = fold_changes_into_view(v1_state, changes(v1, v2),
    ...)``. Groups whose count reaches zero are dropped (they have no
    live rows; keeping a 0/NULL row would make the view disagree with
    a fresh GROUP BY of the base). Sums are DECIMAL so the fold is
    exact and order-independent — a double sum would drift from the
    full recompute it must stay equal to."""
    delta = signed_delta(changes, group_cols, sum_cols, change_type_col)
    folded = (
        state.unionByName(delta)
        .groupBy(*group_cols)
        .agg(
            F.sum("_n").cast("bigint").alias("_n"),
            *[
                F.sum(F.col(c).cast("decimal(28,2)")).alias(c)
                for c in sum_cols
            ],
        )
    )
    # a NEGATIVE live count is proof the feed is corrupt (a delete
    # without its insert — a double-applied batch or a feed read from
    # the wrong version range). The old `> 0` filter silently dropped
    # such groups, erasing the evidence; fail JVM-side instead (r15
    # degenerate-input sweep). Exactly-zero groups still drop — that
    # is the correct retraction of a fully-deleted group.
    folded = folded.select(
        *group_cols,
        F.when(
            F.col("_n") < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "fold_changes_into_view: live count went "
                        "negative ("
                    ),
                    F.col("_n").cast("string"),
                    F.lit(
                        ") — the change feed deleted rows the state "
                        "never saw (double-applied batch or wrong "
                        "version range)"
                    ),
                )
            ).cast("bigint"),
        )
        .otherwise(F.col("_n"))
        .alias("_n"),
        *sum_cols,
    )
    return folded.filter(F.col("_n") > 0)


def view_from_snapshot(
    snapshot: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Bootstrap the stored view state with one full pass over the
    base snapshot — paid once; every later refresh folds only the
    change feed."""
    return snapshot.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[
            F.sum(F.col(c).cast("decimal(28,2)")).alias(c)
            for c in sum_cols
        ],
    )
