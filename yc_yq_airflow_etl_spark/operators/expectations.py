"""Write-path data-quality expectations: declarative row-level rules
evaluated in ONE map-only pass, splitting a batch into clean rows and
a quarantine table with per-rule violation stats.

Reference parity: the reference pipeline trusts its YQL INSERT to land
whatever the query produced (`/root/reference/src/py/yq_dag.py` has no
validation between SELECT and INSERT). A production lake at 100 TB
cannot — bad rows must be diverted, not silently landed and not
fail-the-whole-job. This module is the Delta-style CHECK-constraint /
dead-letter-queue pattern expressed Spark-first:

- Each :class:`Rule` is a named boolean ``Column`` expression — pure
  JVM whole-stage-codegen predicates, never a Python row path.
- :func:`validate` stamps one boolean per rule in a single projection
  and splits via filters on the SAME stamped plan — no shuffle, no
  join. Its three outputs are independent LAZY frames: each one the
  caller consumes costs one scan of the source (a write-clean +
  write-quarantine + collect-stats caller scans three times; persist
  the input, or use :func:`audit` when only the report is needed —
  its whole output derives from ONE scan).
- Violation stats aggregate the stamped booleans with
  partial-aggregated sums (map-side combine), so the audit costs one
  extra reduce of R counters per partition — independent of row count.

NULL semantics: SQL three-valued logic makes ``NULL > 0`` evaluate to
NULL, which a naive ``filter`` would treat as "not a violation". A
rule here FAILS unless its predicate is literally TRUE (``coalesce(p,
false)``) — a NULL in a checked column quarantines the row, matching
CHECK-constraint-with-NOT-NULL intent and the reference's ``unwrap``
fail-on-NULL contract (SURVEY.md §2.9 F1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation. ``predicate`` must be TRUE for a
    row to pass; NULL counts as failure (see module docstring)."""

    name: str
    predicate: Column


def _flag(rule: Rule) -> Column:
    return F.coalesce(rule.predicate.cast("boolean"), F.lit(False))


def _check_rules(rules: list[Rule]) -> list[str]:
    if not rules:
        raise ValueError("need at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    # the report's label namespace is part of the contract: '_total'
    # is the quarantine-summary row, 'combo:<a+b>' rows join labels
    # with '+' — a rule named into that namespace would collide and
    # audit()'s final groupBy would silently MERGE the counts
    bad = [
        n
        for n in names
        if n == "_total" or n.startswith("combo:") or "+" in n
    ]
    if bad:
        raise ValueError(
            f"rule names {bad} collide with report labels "
            "('_total', 'combo:*', or contain '+')"
        )
    return names


def _stamp(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Stamp one boolean per rule plus the per-row ``_failed_rules``
    diagnosis array (empty = clean) in a single projection."""
    names = [r.name for r in rules]
    reserved = {f"_ok_{n}" for n in names} | {"_failed_rules"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with expectation scratch names: {sorted(clash)}"
        )
    return df.select(
        "*", *[_flag(r).alias(f"_ok_{r.name}") for r in rules]
    ).withColumn(
        "_failed_rules",
        F.filter(
            F.array(
                *[
                    F.when(~F.col(f"_ok_{n}"), F.lit(n)).otherwise(
                        F.lit(None)
                    )
                    for n in names
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )


def validate(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantine, stats) under ``rules``.

    - ``clean``: rows passing EVERY rule, original schema.
    - ``quarantine``: rows failing at least one rule, original schema
      plus ``_failed_rules`` (array of rule names — the dead-letter
      diagnosis a reprocessing job needs).
    - ``stats``: one row per rule: (rule, n_checked, n_violations)
      plus a ``_total`` row with (total rows, quarantined rows).

    The split itself is shuffle-free and join-free; each returned
    frame re-scans ``df`` when consumed (they are independent lazy
    plans — see the module docstring; ``audit`` is the single-scan
    report variant). The stats reduce is a global aggregate over
    per-partition partial counters.
    """
    names = _check_rules(rules)
    stamped = _stamp(df, rules)
    flag_cols = [f"_ok_{n}" for n in names]

    clean = stamped.filter(F.size("_failed_rules") == 0).drop(
        *flag_cols, "_failed_rules"
    )
    quarantine = stamped.filter(F.size("_failed_rules") > 0).drop(*flag_cols)

    # ONE global aggregate (map-side partial counters), then the
    # single result row is UNPIVOTED driver-free via explode-of-structs
    # — never a UNION of per-rule aggregates, which would plan one
    # full scan of ``df`` per rule.
    # coalesce every SUM: over an EMPTY batch sum() is NULL, and the
    # report contract is integer zeros, not NULLs
    agg = stamped.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[
            F.coalesce(
                F.sum(F.when(F.col(f"_ok_{n}"), 0).otherwise(1)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"_viol_{n}")
            for n in names
        ],
        F.coalesce(
            F.sum(F.when(F.size("_failed_rules") > 0, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_quarantined"),
    )
    stats = (
        agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.col("_n").alias("n_checked"),
                            F.col(f"_viol_{n}").alias("n_violations"),
                        )
                        for n in names
                    ],
                    F.struct(
                        F.lit("_total").alias("rule"),
                        F.col("_n").alias("n_checked"),
                        F.col("_quarantined").alias("n_violations"),
                    ),
                )
            ).alias("s")
        )
        .select("s.rule", "s.n_checked", "s.n_violations")
    )
    return clean, quarantine, stats


def audit(
    df: DataFrame, rules: list[Rule], checksum_col: str | None = None
) -> DataFrame:
    """Audit-only variant: the full quality report — per-rule
    violation counts, the ``_total`` quarantine row, AND one row per
    observed failed-rule COMBINATION (``combo:<r1+r2>``) — from a
    SINGLE scan of ``df``.

    ``checksum_col`` (optional): an integer key column; when set, the
    report gains ``violation_key_sum`` — per rule row, the key sum of
    the rows VIOLATING that rule (``_total``: keys of all quarantined
    rows; combo rows: keys in that combo) — pinning WHICH rows failed,
    not just how many. Rides the same single-scan rollup: the combo
    frame carries one extra bigint sum, so the cost is one counter per
    partition, independent of row count.

    The scan rolls up into a combo-cardinality frame (≤2^R groups;
    map-side partial aggregation collapses every task to ≤2^R rows,
    so the low-cardinality reduce is metadata-scale, not a skew
    hazard). Each combo row then EXPLODES into its per-tag
    contributions — one struct per rule, one for ``_total``, one for
    its own combo label — and a second metadata-scale aggregate sums
    them. Deliberately NOT a union of a per-rule branch and a combo
    branch over the rollup: the branches' filters push down
    differently, defeating exchange reuse, and the source would be
    scanned once per branch. Use this when only the report is needed;
    ``validate`` when the clean/quarantine rows themselves are."""
    names = _check_rules(rules)
    ksum_src = (
        F.coalesce(F.sum(F.col(checksum_col).cast("bigint")), F.lit(0))
        if checksum_col is not None
        else F.lit(0)
    )
    combos = (
        _stamp(df, rules)
        .groupBy("_failed_rules")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            ksum_src.cast("bigint").alias("ksum"),
        )
    )
    # sentinel: one all-clean zero-count combo, ALWAYS present. It
    # contributes 0 to every tag and emits no combo row, but it
    # guarantees the per-rule and _total report rows exist even for an
    # EMPTY batch (whose rollup would otherwise produce no rows at
    # all — the report contract is zeros, not absence).
    sentinel = df.sparkSession.range(1).select(
        F.array().cast("array<string>").alias("_failed_rules"),
        F.lit(0).cast("bigint").alias("cnt"),
        F.lit(0).cast("bigint").alias("ksum"),
    )
    combos = combos.unionAll(sentinel)
    nonempty = F.size("_failed_rules") > 0
    zero = F.lit(0).cast("bigint")
    rule_structs = [
        F.struct(
            F.lit(n).alias("rule"),
            F.col("cnt").alias("chk"),
            F.when(F.array_contains("_failed_rules", n), F.col("cnt"))
            .otherwise(zero)
            .cast("bigint")
            .alias("vio"),
            F.when(F.array_contains("_failed_rules", n), F.col("ksum"))
            .otherwise(zero)
            .cast("bigint")
            .alias("ks"),
        )
        for n in names
    ]
    total_struct = F.struct(
        F.lit("_total").alias("rule"),
        F.col("cnt").alias("chk"),
        F.when(nonempty, F.col("cnt")).otherwise(zero).cast("bigint").alias("vio"),
        F.when(nonempty, F.col("ksum")).otherwise(zero).cast("bigint").alias("ks"),
    )
    combo_struct = F.when(
        nonempty,
        F.array(
            F.struct(
                F.concat(
                    F.lit("combo:"),
                    F.array_join(F.col("_failed_rules"), "+"),
                ).alias("rule"),
                F.col("cnt").alias("chk"),
                F.col("cnt").alias("vio"),
                F.col("ksum").alias("ks"),
            )
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<rule:string,chk:bigint,vio:bigint,ks:bigint>>"
        )
    )
    report = (
        combos.select(
            F.explode(
                F.concat(F.array(*rule_structs, total_struct), combo_struct)
            ).alias("s")
        )
        .groupBy(F.col("s.rule").alias("rule"))
        .agg(
            F.sum("s.chk").cast("bigint").alias("n_checked"),
            F.sum("s.vio").cast("bigint").alias("n_violations"),
            F.sum("s.ks").cast("bigint").alias("violation_key_sum"),
        )
    )
    if checksum_col is None:
        report = report.drop("violation_key_sum")
    return report
