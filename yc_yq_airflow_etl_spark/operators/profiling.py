"""Guarded exact/approx routing for the two profiling shapes whose
EXACT plans do not survive 100× scale:

- per-group exact interpolated percentiles (Spark ``percentile``
  buffers every value of a group in one aggregation buffer — a hot
  group at 100 TB is an executor OOM);
- exact multi-column NDV (each ``count_distinct`` is its own distinct
  aggregation path; Spark's multi-distinct rewrite expands the scan
  through a grouping-id union — one extra shuffle PER PROFILED
  COLUMN).

Both have sketch twins that are fixed-size-accumulator, one-scan
plans (``percentile_approx`` / HyperLogLog++). These wrappers make
the routing MECHANICAL, same contract as
:func:`~.similarity.topk_join`: count the input (one column-pruned
job, trivial next to what it gates), and past ``exact_row_limit``
the DEFAULT is a loud driver-side ValueError — the exact contract is
never silently degraded. Callers opt in to the approx route with
``oversize="approx"``; the switch emits a RuntimeWarning so it is
never silent.

Reference parity note: the reference delegates profiling-style
statements to its managed engines (the PL/pgSQL maintenance path,
``src/py/yq_dag.py:107-118``), which enforce their own memory
guards; this module is where the rebuilt engine pins that "exact
plans must fail loudly rather than OOM" discipline.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_percentiles", "profile_columns"]


def _prob_alias(p: float) -> str:
    # 0.25 -> p25, 0.5 -> p50, 0.999 -> p99_9
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    exact_row_limit: int = 50_000_000,
    oversize: str = "error",
    accuracy: int = 10_000,
    extra_aggs: Sequence = (),
) -> DataFrame:
    """Per-group percentiles of ``value_col``: exact interpolated
    (``percentile``, ≡ DuckDB ``quantile_cont``) while the input is
    under ``exact_row_limit`` rows; past it, fail loudly (default) or
    route to ``percentile_approx`` (Greenwald-Khanna style sketch,
    bounded memory per group, ``oversize="approx"``). Output columns:
    the group columns plus one ``p{prob}`` column per prob, plus any
    ``extra_aggs`` (scale-safe aggregates like min/max, computed in
    the SAME single agg so the guard never costs a second scan)."""
    n = df.count()
    exact = n <= exact_row_limit
    if not exact:
        if oversize != "approx":
            raise ValueError(
                f"grouped_percentiles input has {n} rows (> "
                f"exact_row_limit={exact_row_limit}); the exact "
                "per-group percentile buffers every group value in "
                "one aggregation buffer — pass oversize='approx' to "
                "route to the percentile_approx sketch"
            )
        warnings.warn(
            f"grouped_percentiles input has {n} rows (> "
            f"exact_row_limit={exact_row_limit}); routing to the "
            "APPROXIMATE percentile_approx path — rank error is "
            f"bounded by 1/accuracy={accuracy}, not exact",
            RuntimeWarning,
            stacklevel=2,
        )
    aggs = [
        (
            F.expr(f"percentile({value_col}, {p!r})")
            if exact
            else F.percentile_approx(value_col, p, accuracy)
        ).alias(_prob_alias(p))
        for p in probs
    ]
    return df.groupBy(*list(group_cols)).agg(*aggs, *list(extra_aggs))


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    exact_row_limit: int = 100_000_000,
    oversize: str = "error",
    rsd: float = 0.02,
) -> DataFrame:
    """One-scan column profile: per column of ``cols``, row count,
    null count, distinct count, and min/max as strings (one schema
    fits numeric and text columns). All columns profile as
    independent expressions in a single groupBy-less agg — one read
    at any scale. NDV is exact ``count_distinct`` while the input is
    under ``exact_row_limit`` rows; past it, fail loudly (default) or
    route every NDV to HyperLogLog++ (``oversize="approx"``, fixed
    accumulator folded in the same partial+final pass — the profile
    stays ONE map-side-combined scan regardless of cardinality).

    Returns a ``len(cols)``-row frame: ``col, n_rows, n_nulls,
    n_distinct, ndv_exact, min_s, max_s``. The unpivot is a
    ``stack()`` over the 1-row agg INSIDE the same plan — no
    driver-side materialization (a local createDataFrame round-trip
    measured ~1s of fixed overhead per call), so the whole profile is
    one lazy DataFrame: scan → agg → stack."""
    n = df.count()
    exact = n <= exact_row_limit
    if not exact:
        if oversize != "approx":
            raise ValueError(
                f"profile_columns input has {n} rows (> "
                f"exact_row_limit={exact_row_limit}); exact NDV pays "
                "one gid-Expand shuffle per profiled column — pass "
                "oversize='approx' to route NDV to HyperLogLog++"
            )
        warnings.warn(
            f"profile_columns input has {n} rows (> "
            f"exact_row_limit={exact_row_limit}); routing NDV to the "
            f"APPROXIMATE HyperLogLog++ path (rsd={rsd}), not exact",
            RuntimeWarning,
            stacklevel=2,
        )
    aggs = []
    for c in cols:
        ndv = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("int"))
            .cast("bigint")
            .alias(f"{c}__nulls"),
            ndv.cast("bigint").alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    exact_lit = "true" if exact else "false"
    stacked = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__ndv, {exact_lit}, "
        f"{c}__min, {c}__max"
        for c in cols
    )
    return df.agg(*aggs).selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(col, n_rows, n_nulls, n_distinct, ndv_exact, min_s, max_s)"
    ).orderBy("col")
