"""User-defined function surface: scalar Pandas UDF, grouped-map
UDAF-style aggregation, and a Python UDTF — the three registration
paths SURVEY.md §2.12 lists as extension ('UDF/UDAF/UDTF: no — ext').

Engine policy (also asserted in the README): built-ins first — these
exist for the cases built-ins can't express (numpy/model scoring,
whole-group computations, one-to-many generators) and all ride Arrow,
never row-at-a-time pickling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def text_density_score(text: pd.Series) -> pd.Series:
    """Vectorized scalar Pandas UDF: a toy quality score,
    tokens / sqrt(1 + chars) — numpy math over Arrow batches (stands
    in for e.g. a perplexity-model scorer)."""
    import numpy as np

    stripped = text.fillna("").str.strip().str.lower()
    toks = stripped.str.split(r"\s+").str.len().astype("float64")
    chars = stripped.str.len().astype("float64")
    # floor(x*1e6+0.5)/1e6, not .round(6): numpy rounds half-even on
    # the binary double while DuckDB rounds half away — the floor form
    # is bit-identical across numpy/Spark/DuckDB (registry header)
    return np.floor(toks / np.sqrt(1.0 + chars) * 1e6 + 0.5) / 1e6


LANG_STATS_SCHEMA = T.StructType(
    [
        # nullable by SQL semantics (r15 degenerate-input sweep): the
        # NULL language is a legal group, a single-doc group's sample
        # std is NULL (not numpy's NaN), and value stats over an
        # all-NULL group are NULL — matching DuckDB/ANSI aggregates
        # exactly, which is the whole point of the oracle pairing
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("mean_chars", T.DoubleType(), True),
        T.StructField("std_chars", T.DoubleType(), True),
        T.StructField("sum_chars", T.LongType(), True),
        T.StructField("min_chars", T.LongType(), True),
        T.StructField("max_chars", T.LongType(), True),
        T.StructField("doc_id_sum", T.LongType(), True),
    ]
)


def lang_char_stats(documents: DataFrame) -> DataFrame:
    """UDAF-style grouped-map aggregation (applyInPandas): per-language
    doc count + mean/sample-std of n_chars computed with numpy over
    the whole group. Each group must fit one executor's memory — the
    operator contract for grouped-map; per-language doc populations do.

    Deepened pins (r11): sum/min/max of n_chars as exact int64 — the
    float mean/std tolerate a 6-decimal rounding slack and could mask
    a group that lost or swapped a member near the rounding grain;
    the integer triple cannot. (r12): ``doc_id_sum`` — group
    MEMBERSHIP, not just the value distribution: two docs of equal
    length traded between languages preserve every char stat but
    never both groups' id checksums.

    Degenerate groups follow SQL aggregate semantics exactly (r15
    sweep — the fixture data masked three latent cross-engine
    divergences): ``count(*)`` counts every row but the value stats
    ignore NULL ``n_chars`` (the old int64 conversion CRASHED on a
    NULL); a single-value group's sample std is NULL, not numpy's
    ddof=1 NaN (DuckDB's ``stddev_samp`` returns NULL, and the driver
    hash would diverge); an all-NULL group's mean/std/sum/min/max are
    NULL; the NULL language is a legal group.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vals = pdf["n_chars"].dropna()
        x = vals.to_numpy(dtype="float64")
        xi = vals.to_numpy(dtype="int64")
        n_vals = len(x)

        def r6(v: float) -> float:
            return float(np.floor(v * 1e6 + 0.5) / 1e6)

        lang = pdf["lang"].iloc[0]
        ids = pdf["doc_id"].dropna()
        return pd.DataFrame(
            {
                "lang": [None if pd.isna(lang) else lang],
                "n_docs": [len(pdf)],
                # IEEE-stable 6-decimal form, same rationale as
                # text_density_score above
                "mean_chars": [r6(np.mean(x)) if n_vals else None],
                "std_chars": [
                    r6(np.std(x, ddof=1)) if n_vals >= 2 else None
                ],
                "sum_chars": [int(xi.sum()) if n_vals else None],
                "min_chars": [int(xi.min()) if n_vals else None],
                "max_chars": [int(xi.max()) if n_vals else None],
                "doc_id_sum": [
                    int(ids.to_numpy(dtype="int64").sum())
                    if len(ids)
                    else None
                ],
            }
        )

    return documents.groupBy("lang").applyInPandas(stats, LANG_STATS_SCHEMA)


class WordNGrams:
    """Python UDTF (Spark 4): one input row → one row per word n-gram.

    Built-ins (explode over a transform) are the fast path for this
    exact job; the UDTF exists to pin the table-function registration
    surface with a deterministic, oracle-checkable example."""

    def eval(self, doc_id: int, text: str, n: int):  # noqa: D401
        if n is None or n < 1:
            # a 0/negative/NULL n would silently yield empty or
            # nonsense grams for every row (r15 sweep): words[i:i+0]
            # is "" and the count still looks plausible downstream
            raise ValueError(f"word_ngrams: n must be >= 1, got {n}")
        if text is None:
            return
        words = text.strip().lower().split()
        for i in range(max(len(words) - n + 1, 0)):
            yield doc_id, " ".join(words[i : i + n])


def word_ngrams_udtf():
    from pyspark.sql.functions import udtf

    return udtf(WordNGrams, returnType="doc_id: bigint, ngram: string")


def register_all(spark) -> None:
    """Register the UDF surface in a session's SQL namespace."""
    spark.udf.register("text_density_score", text_density_score)
    spark.udtf.register("word_ngrams", word_ngrams_udtf())
