"""Mergeable distinct-count sketches (DataSketches HLL, built into
Spark 4's ``hll_sketch_agg`` family).

Why this exists in a cooling pipeline: the reference DESTROYS source
partitions after export (drop_copied_partition, yq_dag.py:106-122).
Any global statistic that needs the raw rows — "distinct debit
accounts across all years" — becomes a full-lake scan afterwards, and
at 100 TB that scan is the most expensive query in the system. A
persisted HLL sketch per retired partition makes the statistic
incremental: each pipeline run adds one ~4 KB binary row, and the
all-time answer is a union of sketches — kilobytes, not terabytes.

The sketch column is plain BINARY in parquet, so the store is just a
LakeTable-style path: no custom serialization, readable by any Spark
or DataSketches-compatible engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One row per group: a mergeable HLL sketch of ``value_col``'s
    distinct values plus the exact row count. lgK=12 → ~1.6% relative
    standard error in ~4 KB per sketch."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_estimate(
    sketches: DataFrame, by: Sequence[str] = ()
) -> DataFrame:
    """Union sketches (optionally per ``by`` group) and return the
    distinct-count estimate. Input is the persisted sketch table —
    the raw data is not touched."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").alias("n_rows"),
    ]
    if by:
        return sketches.groupBy(*list(by)).agg(*agg)
    return sketches.agg(*agg)


class SketchStore:
    """Parquet-backed store of per-partition sketches, appended by the
    pipeline as each partition is exported/retired."""

    def __init__(self, path: str):
        self.path = path

    def add(self, sketches: DataFrame) -> None:
        sketches.write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def estimate(
        self, spark: SparkSession, by: Sequence[str] = ()
    ) -> DataFrame:
        return merge_estimate(self.read(spark), by)


# --- mergeable quantile store (equi-width histograms) -------------------
#
# Same retirement problem as the HLL store, for QUANTILES: once the
# raw partitions are dropped, "p95 payment amount across all years"
# would need the full lake. An equi-width histogram is the trivially
# mergeable quantile sketch — bin counts are plain BIGINTs, merging is
# a sum per bin, and every step is exact integer arithmetic, so a SQL
# oracle replays it bit-for-bit (unlike KLL/GK sketch internals).
# Error bound: a quantile estimate is off by at most one bin width.


def build_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group equi-width histogram of ``value_col`` over the fixed
    domain [lo, hi): one row per (group, bin) with an exact count.
    Values outside the domain clamp into the edge bins (so totals are
    preserved and the merge stays lossless). Fixed domain is the price
    of mergeability — pick it from the column's business range."""
    # degenerate-domain guard (r16): lo == hi divides every value by
    # zero — in-domain values bin NaN, which greatest/least silently
    # clamp into the TOP edge bin (all mass in bin N-1, no error);
    # lo > hi flips the binning direction and mirrors the histogram.
    # Both are caller bugs, refused loudly.
    if not (hi > lo):
        raise ValueError(
            f"histogram domain must satisfy lo < hi, got [{lo}, {hi})"
        )
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(hi - lo) * bins).cast("int")
    bin_ = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
    # NULL/NaN are not values of the domain: greatest(0, NULL) is 0
    # (greatest IGNORES null operands), so without the filter every
    # NULL/NaN would silently count into bin 0 and permanently skew
    # the persisted histogram toward lo
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(hist: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """Merge persisted histogram rows (optionally per ``by`` group):
    sum counts per bin — the whole merge operator."""
    return hist.groupBy(*by, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a merged histogram: for each q, the
    LEFT EDGE of the first bin whose cumulative count reaches
    ceil(q · N). Deterministic closed form over exact integers (the
    only float is the final edge arithmetic), so the DuckDB twin
    reproduces it exactly; estimate error ≤ one bin width."""
    import math

    from pyspark.sql import Window

    # same domain contract as build_histogram (r16): a zero/negative
    # span silently mislabels every estimate edge
    if not (hi > lo):
        raise ValueError(
            f"histogram domain must satisfy lo < hi, got [{lo}, {hi})"
        )
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    total = hist.agg(F.sum("cnt")).first()[0] or 0
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", "cnt").withColumn("cum", F.sum("cnt").over(w))
    width = (hi - lo) / bins
    out = None
    for q in qs:
        target = math.ceil(total * q)
        row = (
            cum.filter(F.col("cum") >= F.lit(int(target)))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(float(q)).alias("q"),
                (F.lit(lo) + F.col("bin") * F.lit(width)).alias("estimate"),
                # exact-integer provenance (r12): the selected bin and
                # its cumulative count — the estimate is a float edge
                # two different (bin, cum) states could coincide on;
                # the integers pin the histogram state that chose it
                F.col("bin").cast("int").alias("bin"),
                F.col("cum").cast("bigint").alias("cum_count"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# -- count-min sketch ----------------------------------------------------


def build_cms(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch cells over a key column: (r, bucket, cnt) with
    ``depth`` md5-derived hash rows of ``width`` buckets. One scan —
    explode the row indexes, bucket each (key, row), partial-combined
    count. Like the HLL and histogram stores above, the sketch is
    MERGEABLE (cells add), so per-partition/per-day sketches roll up
    without touching raw data — frequency estimates survive source
    retirement the same way the reference's verified-then-retired
    contract expects. md5 keeps the construction engine-portable
    (replayed exactly in the DuckDB oracle)."""
    # depth=0 explodes an EMPTY array — every row silently dropped,
    # the sketch empty, every estimate 0 (the one direction CMS must
    # never err); width=0 is `% 0` — DIVIDE_BY_ZERO under the
    # pinned-ANSI session (r16)
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    rows = F.explode(F.lit(list(range(depth)))).alias("r")
    # NULL keys have no frequency semantics: md5(NULL) is NULL, so
    # unfiltered they would land as (r, NULL-bucket) junk cells — never
    # probed (NULL joins nothing) but carried by every merge forever
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("_k"), rows
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("_k"), F.lit("|"), F.col("r").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        keyed.withColumn("bucket", bucket)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches: cells add (the linearity that makes the
    sketch a store, not a one-shot query)."""
    if not sketches:
        raise ValueError(
            "merge_cms needs at least one sketch (an empty merge has "
            "no schema to return)"
        )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return out.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over hash rows of
    the key's cell (0 for an untouched cell). Estimates only ever
    OVERcount (collisions add), never under — the caller-visible
    contract.
    Same depth/width contract as :func:`build_cms` (r16): degenerate
    values refuse loudly before the probe plan is built. The probe set is small by construction (heavy-hitter
    candidates), so the probe side broadcasts and the sketch itself
    is ~depth×width rows — trivially broadcastable at any data
    scale."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    rows = F.explode(F.lit(list(range(depth)))).alias("r")
    probe = keys.select(F.col(key_col), rows).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit("|"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    return (
        probe.join(F.broadcast(cms), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            # a NULL probe key was never sketched (build filters NULLs),
            # so its buckets are NULL and the join misses — reporting 0
            # would be an UNDERcount for a table that did contain NULL
            # keys, violating the overcount-only contract. NULL keys
            # estimate NULL: "no frequency semantics", not "seen zero
            # times" (r15 degenerate-input sweep).
            F.when(F.col(key_col).isNull(), F.lit(None).cast("long"))
            .otherwise(F.min(F.coalesce("cnt", F.lit(0))))
            .alias("cms_est")
        )
    )


# -- Bloom filter: broadcastable membership pre-filter ------------------


def _check_bloom_params(num_bits: int, k: int) -> None:
    """num_bits must be a positive multiple of 64 (r16): the bitmap
    is packed into 64-bit words, and a non-multiple makes the top
    word's index land PAST the probe-side array — an IndexError deep
    in the collect loop naming neither param; num_bits < 64 makes the
    array empty. k < 1 sets no bits: every membership test silently
    answers 'maybe absent' and the prefilter drops all rows."""
    if num_bits < 64 or num_bits % 64:
        raise ValueError(
            f"num_bits must be a positive multiple of 64, got {num_bits}"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def _bloom_pos(col, seed: int, num_bits: int):
    """Bit position ``seed`` for a key: first 15 hex chars of
    md5(value ':' seed) as a 60-bit integer, mod ``num_bits``.
    15 hex chars (not 16) so the value fits a signed BIGINT in both
    Spark and DuckDB — the same engine-portability rule as the CMS
    bucket hash above."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(col).cast("string"),
                        F.lit(":"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % num_bits
    )


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Build a Bloom filter over ``col`` as (word_idx, bits) rows —
    the packed-bitmap words, one row per NON-ZERO 64-bit word.

    Why rows and not a single binary blob: rows are MERGEABLE with a
    plain ``bit_or`` groupBy (union of filters = union of word rows),
    survive parquet round-trips like the other sketch stores, and the
    build is one partial-aggregated shuffle of at most
    ``num_bits/64`` groups — metadata-scale regardless of input size.
    """
    _check_bloom_params(num_bits, k)
    # md5(NULL) is NULL: a NULL key would emit a (NULL, NULL) word
    # row that crashes the probe's int() loop — and NULL has no
    # membership semantics in a Bloom filter anyway
    positions = df.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.array(*[_bloom_pos(col, i, num_bits) for i in range(k)])
        ).alias("_p")
    )
    return (
        positions.select(
            F.expr("_p DIV 64").cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_p") % 64).cast("int")
            ).alias("_b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_might_contain(
    words: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    k: int = 3,
):
    """Membership predicate Column for a built filter: true iff every
    one of the key's ``k`` bit positions is set. No false negatives
    ever; false-positive rate ≈ (1 - e^(-k·n/m))^k.

    The words collect is bounded by ``num_bits/64`` rows (16 KB of
    longs for 2^20 bits) — the filter is embedded in the plan as an
    array literal, so the probe is a pure per-row JVM expression: no
    join, no shuffle, no Python. This is the 100 TB shuffle-reduction
    shape — evaluate the cheap bitmap test BEFORE the exchange and
    only shuffle the survivors into the exact join."""
    _check_bloom_params(num_bits, k)
    if num_bits > 1 << 24:
        raise ValueError(
            f"num_bits={num_bits} would embed a {num_bits // 8 >> 20} MB+ "
            "literal in the plan; for filters past 2^24 bits, join on "
            "word_idx against the words table instead of embedding it"
        )
    import numpy as np

    arr = [0] * (num_bits // 64)
    for r in words.collect():  # bounded by num_bits/64 — metadata-scale
        arr[int(r["word_idx"])] = int(r["bits"])
    # ONE py4j call for the whole words literal (r18): on classic
    # PySpark only the numpy-1D-array form of ``F.lit`` crosses the
    # boundary as a single converter call — ``F.lit(list)`` (the r17
    # attempt) expands to ``array(*[lit(item) ...])``, one JVM
    # round-trip per word, so a 2^16-bit filter cost ~1 s of DRIVER
    # time to build the predicate (measured: 1.10 s list vs 0.18 s
    # numpy for 1024 words). int64 dtype pins the element type to
    # bigint regardless of word values (the list form inferred it
    # from content). Identical literal values, collect-verified.
    lit_arr = F.lit(np.asarray(arr, dtype=np.int64))
    cond = None
    for i in range(k):
        p = _bloom_pos(col, i, num_bits)
        word = F.element_at(lit_arr, (p / 64).cast("int") + F.lit(1))
        bit_set = (
            F.call_function(
                "shiftright", word, (p % 64).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
        cond = bit_set if cond is None else (cond & bit_set)
    return cond


# --- KMV (k-minimum-values) distinct sketches -----------------------


KMV_HASH_SPACE = 1 << 60  # 15 hex chars of md5 — same rule as CMS/Bloom


def kmv_hash(col) -> "F.Column":
    """The deterministic 60-bit uniform hash every KMV sketch uses:
    first 15 hex chars of md5(value-as-string) — identical to the
    CMS/Bloom/split hashing convention, so DuckDB replays it
    bit-for-bit (``('0x' || substr(md5(v::VARCHAR),1,15))::UBIGINT``).
    """
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, assume_distinct: bool = False
) -> DataFrame:
    """The k smallest distinct hash values of ``df[col]`` — a
    mergeable bottom-k distinct sketch (Bar-Yossef et al.; the
    estimator Presto/Trino ship as ``approx_set``-style planning
    input). Returns a ≤k-row frame of ``h`` values.

    Scale shape: one partial-aggregated distinct shuffle, then
    ``orderBy(h).limit(k)`` compiles to TakeOrderedAndProject — every
    task keeps its local bottom-k and the driver-side merge touches
    ≤ k·tasks hashes, never the key population. Merging two sketches
    is union → bottom-k, which is how the join-cardinality probe
    below estimates the UNION's distinct count without re-scanning
    either side.

    Estimator (applied identically in the DuckDB oracles): if the
    sketch holds fewer than k values it IS the exact distinct set;
    otherwise D ≈ (k-1) · 2^60 / h_k with h_k the largest retained
    hash (standard error ≈ 1/√(k−2))."""
    if k < 1:
        # limit(0) is a silently EMPTY sketch — every distinct-count
        # estimate downstream becomes 0 with no error (r16)
        raise ValueError(f"k must be >= 1, got {k}")
    # NULL is not a value: md5(NULL) → h=NULL sorts FIRST under
    # ascending NULLS FIRST, stealing a bottom-k slot (inflating
    # error) and counting as one extra distinct in the < k exact
    # regime — and a merge would propagate it
    base = df.select(F.col(col)).filter(F.col(col).isNotNull())
    if not assume_distinct:
        base = base.distinct()
    # assume_distinct=True (r18): callers that already hold a
    # deduplicated key frame (e.g. one shared with an exact-count
    # consumer) skip the redundant distinct exchange; the sketch over
    # a truly-distinct input is value-identical by construction
    # (pinned by test_kmv_sketch_assume_distinct_identical).
    return (
        base
        .select(kmv_hash(F.col(col)).alias("h"))
        # KMV is defined over DISTINCT hashes: a (60-bit md5) collision
        # between two distinct raw values must retain ONE h, not two —
        # duplicate h values would shrink the effective k and bias the
        # estimator. Negligible probability, but the sketch should hold
        # the definition, not a close approximation of it.
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate_col(n_col, hk_col, k: int):
    """Column expression for the KMV distinct estimate given the
    sketch size and its max hash — written as the exact same IEEE
    expression the oracle uses: ``(k-1) * 2^60 / h_k`` (the numerator
    is exactly representable: (k-1) fits the double mantissa next to
    the power of two)."""
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(float(k - 1) * KMV_HASH_SPACE) / hk_col.cast("double")
    )
