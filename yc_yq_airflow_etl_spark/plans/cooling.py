"""The cooling pipeline — the reference's actual product
(yq_dag.py:45-137): move one year of the hot store to the lake,
verify byte-equivalence, and only then retire the hot partition.

Task graph (yq_dag.py:136-137, img/DAG_chart.png):

    s3_delete_year >> yq_load_task >> yq_check_diff_task
        >> check_result >> [drop_copied_partition, raise_error]
    drop_copied_partition >> shift_date

Spark-native shape: ``s3_delete_year`` is subsumed by dynamic
partition overwrite; the two YQL queries become :func:`load_year` and
:func:`reconcile_year`; the branch/raise/advance become ordinary
Python in :meth:`CoolingPipeline.run_once`. The safety property the
reference pins — destructive source retirement happens **only** after
an empty reconciliation diff — is preserved structurally: the
``retire`` hook is invoked inside the ``count == 0`` branch and
nowhere else.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import get_year, to_datetime, to_uint32, unwrap
from ..operators import exclusion_join  # noqa: F401  (diff-row queries)
from ..operators.joins import exclusion_diff_count
from ..sources.lake import LakeTable
from ..sources.state import PipelineState

# Reconciliation key (yq_dag.py:93-94): payment_date deliberately
# excluded — one side passed through a second-precision Datetime cast.
RECONCILE_KEY = ["id", "doc_num", "accdt", "acckt", "amount", "state"]


class ReconciliationError(ValueError):
    """yq_dag.py:28-29: ``raise ValueError('Data are not equal!')``."""


def extract_window(
    payments: DataFrame, lo: datetime, hi: datetime, strict_datetime: bool = False
) -> DataFrame:
    """The load query's ``$s`` (yq_dag.py:66-70): one-year half-open
    window, ``unwrap(id)``, second-precision datetime cast.

    The filter is applied to the *raw* column before the cast so the
    predicate stays pushable to the source scan (JDBC pushdown /
    parquet row-group pruning) — the reference achieves the same by
    hand-inlining the filter into the per-source subquery.
    """
    p = payments
    out = p.filter(
        (F.col("payment_date") >= F.lit(lo)) & (F.col("payment_date") < F.lit(hi))
    ).select(
        unwrap("id", "payments.id").alias("id"),
        F.col("doc_num"),
        F.col("accdt"),
        F.col("acckt"),
        F.col("amount"),
        to_datetime("payment_date", strict=strict_datetime).alias("payment_date"),
        F.col("descr"),
        F.col("state"),
    )
    return out


def load_year(
    payments: DataFrame, lake: LakeTable, lo: datetime, hi: datetime
) -> None:
    """yq_load_task (yq_dag.py:61-75): extract window, derive
    ``payment_year = unwrap(cast(DateTime::GetYear(payment_date) as
    UInt32))``, overwrite the target partition."""
    staged = extract_window(payments, lo, hi).withColumn(
        "payment_year", to_uint32(get_year("payment_date"), "payment_year")
    )
    # cluster by payment_date inside each file: the reconciliation
    # readback and every time-range query then skip row groups via
    # parquet min/max stats (see LakeTable.overwrite_partitions)
    lake.overwrite_partitions(staged, sort_by=("payment_date",))


def reconcile_year(
    spark: SparkSession,
    payments: DataFrame,
    lake: LakeTable,
    lo: datetime,
    hi: datetime,
) -> int:
    """yq_check_diff_task (yq_dag.py:77-96): recompute both sides from
    their systems of record, EXCLUSION JOIN on the 6-col key, return
    the symmetric-difference count (0 ⇔ export verified).

    The lake readback filters on the ``payment_year`` partition column
    (equivalent to the reference's payment_date range given the
    pipeline writes year-aligned windows) so the scan prunes to the
    one Hive partition instead of reading the whole lake.
    """
    s = extract_window(payments, lo, hi).select(*RECONCILE_KEY)
    d = (
        lake.read(spark)
        .filter(
            (F.col("payment_year") >= F.lit(lo.year))
            & (F.col("payment_year") <= F.lit(hi.year))
        )
        .filter(
            (F.col("payment_date") >= F.lit(lo)) & (F.col("payment_date") < F.lit(hi))
        )
        .select(*RECONCILE_KEY)
    )
    return exclusion_diff_count(s, d, RECONCILE_KEY)


@dataclass
class CoolingPipeline:
    """The whole DAG as a driver object.

    ``retire`` stands in for ``drop_copied_partition``
    (yq_dag.py:106-122, the PL/pgSQL loop dropping
    ``payments_y<year>*`` child tables over JDBC) — injected because
    test fixtures have no PG; the production impl issues the same
    catalog-driven DROPs through a JDBC statement connection.
    """

    spark: SparkSession
    source: Callable[[], DataFrame]  # hot store reader (pg-finance.payments)
    lake: LakeTable
    state: PipelineState
    initial_watermark: str = "2020-01-01"
    retire: Callable[[int], None] = field(default=lambda year: None)

    def window(self) -> tuple[datetime, datetime]:
        """[EXP_DATE, EXP_DATE + 1 year) — yq_dag.py:13-14."""
        lo = self.state.get_watermark(self.initial_watermark)
        hi = lo.replace(year=lo.year + 1)
        return lo, hi

    def run_once(self, skip_load: bool = False) -> dict:
        """One DAG run: load → reconcile → branch → retire → advance,
        under the single-active-run lock (``max_active_runs=1``,
        yq_dag.py:50 — a concurrent run raises PipelineBusyError).

        ``skip_load=True`` runs verification-only over an existing
        lake partition (an operator re-checking a past export)."""
        with self.state.lock():
            return self._run_locked(skip_load)

    def _run_locked(self, skip_load: bool) -> dict:
        lo, hi = self.window()
        payments = self.source()
        if not skip_load:
            load_year(payments, self.lake, lo, hi)
        diff = reconcile_year(self.spark, payments, self.lake, lo, hi)
        if diff != 0:
            # check_result → raise_error branch (yq_dag.py:24-29)
            raise ReconciliationError(
                f"Data are not equal! exclusion-join diff={diff} for "
                f"[{lo:%Y-%m-%d}, {hi:%Y-%m-%d})"
            )
        # check_result → drop_copied_partition → shift_date
        self.retire(lo.year)
        self.state.set_watermark(hi)
        return {"window": (lo, hi), "diff": diff, "retired_year": lo.year}
