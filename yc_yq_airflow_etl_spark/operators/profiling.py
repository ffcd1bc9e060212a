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
never silent. Output schemas are IDENTICAL on both routes (the
percentile column is double either way), so the guard can never
type-drift a downstream consumer.

Reference parity note: the reference delegates profiling-style
statements to its managed engines (the PL/pgSQL maintenance path,
``src/py/yq_dag.py:107-118``), which enforce their own memory
guards; this module is where the rebuilt engine pins that "exact
plans must fail loudly rather than OOM" discipline.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
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
    the group columns plus one ``p{prob}`` DOUBLE column per prob
    (cast on both routes — the sketch returns the input type, the
    exact form returns double; the guard must not type-drift the
    schema), plus any ``extra_aggs`` (scale-safe aggregates like
    min/max, computed in the SAME single agg so the guard never costs
    a second scan). Column references go through ``df[...]``, so
    names the parser would mangle (dots, spaces) are safe."""
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
    v = df[value_col]
    aggs = [
        (
            F.percentile(v, F.lit(p))
            if exact
            else F.percentile_approx(v, p, accuracy).cast("double")
        ).alias(_prob_alias(p))
        for p in probs
    ]
    return df.groupBy(*[df[g] for g in group_cols]).agg(
        *aggs, *list(extra_aggs)
    )


def profile_aggs(
    df: DataFrame,
    cols: Sequence[str],
    ndv: Callable[[Column], Column],
) -> list[Column]:
    """The shared per-column profile aggregate list (count, null
    count, NDV via ``ndv``, min/max as strings), aliased POSITIONALLY
    (``c{i}__*``) so arbitrary column names never leak into
    identifiers. Null count is ``count(1) - count(col)`` — exact 0 on
    an empty input, where ``sum(isnull)`` would be NULL.

    Fuse-in-one-agg note (r17): only safe when ``ndv`` is a
    fixed-buffer aggregate (HLL). With EXACT ``count_distinct`` the
    multi-distinct rewrite drags the string min/max buffers into the
    gid-Expand aggregation, which demotes the whole chain to
    SortAggregate — three full sorts of the 5×-expanded scan
    (measured 2× the split plan at sf0.1, and the sorts scale with
    the table). Exact-NDV callers use :func:`profile_stats_aggs` +
    :func:`profile_ndv_aggs` as two crossJoined 1-row subtrees
    instead: the NDV branch then has no min/max buffers, so the
    Expand feeds a pure HashAggregate (map-side hash dedup, no
    sorts)."""
    aggs: list[Column] = []
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"c{i}__n"),
            (F.count(F.lit(1)) - F.count(col))
            .cast("bigint")
            .alias(f"c{i}__nulls"),
            ndv(col).cast("bigint").alias(f"c{i}__ndv"),
            F.min(col).cast("string").alias(f"c{i}__min"),
            F.max(col).cast("string").alias(f"c{i}__max"),
        ]
    return aggs


def profile_stats_aggs(df: DataFrame, cols: Sequence[str]) -> list[Column]:
    """The NDV-free half of :func:`profile_aggs` (count, null count,
    min/max as strings) — one keyless partial+final agg, no sort, no
    Expand. Same positional ``c{i}__*`` aliases."""
    aggs: list[Column] = []
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"c{i}__n"),
            (F.count(F.lit(1)) - F.count(col))
            .cast("bigint")
            .alias(f"c{i}__nulls"),
            F.min(col).cast("string").alias(f"c{i}__min"),
            F.max(col).cast("string").alias(f"c{i}__max"),
        ]
    return aggs


def profile_ndv_aggs(
    df: DataFrame,
    cols: Sequence[str],
    ndv: Callable[[Column], Column],
) -> list[Column]:
    """The NDV-only half of :func:`profile_aggs`: kept free of any
    variable-length (string min/max) buffer so the exact
    ``count_distinct`` multi-distinct rewrite compiles to
    HashAggregate over the gid-Expand — map-side hash dedup instead
    of the SortAggregate chain (see :func:`profile_aggs` note)."""
    return [
        ndv(df[c]).cast("bigint").alias(f"c{i}__ndv")
        for i, c in enumerate(cols)
    ]


def profile_stack_expr(
    cols: Sequence[str],
    out_cols: str,
    flag_expr: Callable[[int], str],
) -> str:
    """The shared in-plan unpivot: a ``stack()`` selectExpr over the
    1-row profile agg — no driver-side materialization (a local
    createDataFrame round-trip measured ~1 s of fixed overhead per
    call). Labels are SQL-escaped; value references use the
    positional aliases from :func:`profile_aggs`."""
    stacked = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', c{i}__n, c{i}__nulls, "
        f"c{i}__ndv, {flag_expr(i)}, c{i}__min, c{i}__max"
        for i, c in enumerate(cols)
    )
    return f"stack({len(cols)}, {stacked}) AS ({out_cols})"


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    exact_row_limit: int = 100_000_000,
    oversize: str = "error",
    rsd: float = 0.02,
) -> DataFrame:
    """Column profile: per column of ``cols``, row count, null count,
    distinct count, and min/max as strings (one schema fits numeric
    and text columns). All columns profile as independent expressions
    in groupBy-less aggs. NDV is exact ``count_distinct`` while the
    input is under ``exact_row_limit`` rows; past it, fail loudly
    (default) or route every NDV to HyperLogLog++
    (``oversize="approx"``, fixed accumulator folded into the stats
    pass). Scan count (r17 split, docstring corrected r18): the
    APPROX path is one map-side-combined scan; the EXACT path is TWO
    scans BY DESIGN (stats and NDV as crossJoined 1-row aggs — the
    NDV branch carries no string min/max buffers, so its
    multi-distinct Expand hash-aggregates instead of demoting the
    whole pass to a triple-sort SortAggregate chain; measured ~2.2×
    faster than the fused one-scan form), plus the ``df.count()``
    row-count gate below.

    Returns a ``len(cols)``-row frame: ``col, n_rows, n_nulls,
    n_distinct, ndv_exact, min_s, max_s`` as one lazy plan:
    scan → agg → stack (see :func:`profile_stack_expr`)."""
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
    exact_lit = "true" if exact else "false"
    if exact:
        # split plan (r17): stats and exact NDV as two crossJoined
        # 1-row aggs — the NDV branch carries no string min/max
        # buffer, so the multi-distinct Expand hash-aggregates
        # (map-side dedup, zero sorts) instead of the SortAggregate
        # chain the fused agg forces (2× wall at sf0.1; the three
        # sorts of the 5×-expanded scan are what dies at 100 TB).
        wide = df.agg(*profile_stats_aggs(df, cols)).crossJoin(
            df.agg(*profile_ndv_aggs(df, cols, F.count_distinct))
        )
    else:
        # HLL is a fixed-buffer declarative aggregate: it folds into
        # the SAME keyless partial+final pass as count/min/max — one
        # scan, still no sort, nothing to split.
        wide = df.agg(
            *profile_aggs(
                df, cols, lambda col: F.approx_count_distinct(col, rsd)
            )
        )
    return wide.selectExpr(
        profile_stack_expr(
            cols,
            "col, n_rows, n_nulls, n_distinct, ndv_exact, min_s, max_s",
            lambda i: exact_lit,
        )
    ).orderBy("col")
