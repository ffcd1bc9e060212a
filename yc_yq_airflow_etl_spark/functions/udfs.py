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
        T.StructField("lang", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("mean_chars", T.DoubleType(), False),
        T.StructField("std_chars", T.DoubleType(), False),
        T.StructField("sum_chars", T.LongType(), False),
        T.StructField("min_chars", T.LongType(), False),
        T.StructField("max_chars", T.LongType(), False),
        T.StructField("doc_id_sum", T.LongType(), False),
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
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["n_chars"].to_numpy(dtype="float64")
        xi = pdf["n_chars"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(x)],
                # IEEE-stable 6-decimal form, same rationale as
                # text_density_score above
                "mean_chars": [
                    float(np.floor(np.mean(x) * 1e6 + 0.5) / 1e6)
                ],
                "std_chars": [
                    float(np.floor(np.std(x, ddof=1) * 1e6 + 0.5) / 1e6)
                ],
                "sum_chars": [int(xi.sum())],
                "min_chars": [int(xi.min())],
                "max_chars": [int(xi.max())],
                "doc_id_sum": [int(pdf["doc_id"].to_numpy(dtype="int64").sum())],
            }
        )

    return documents.groupBy("lang").applyInPandas(stats, LANG_STATS_SCHEMA)


class WordNGrams:
    """Python UDTF (Spark 4): one input row → one row per word n-gram.

    Built-ins (explode over a transform) are the fast path for this
    exact job; the UDTF exists to pin the table-function registration
    surface with a deterministic, oracle-checkable example."""

    def eval(self, doc_id: int, text: str, n: int):  # noqa: D401
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
