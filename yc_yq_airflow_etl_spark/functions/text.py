"""Text-analysis expression layer for training-data pipelines — all
JVM-side (split/transform/aggregate higher-order functions), no Python
UDFs, so they run inside whole-stage codegen at 100 TB.

Design constraint: every function here must be replayable in ANSI-ish
SQL (the DuckDB oracle), which is why hashes are built on md5 (shared
by both engines) rather than xxhash64 (Spark-only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # fingerprint modulus: keeps a*31+c inside int64


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse — the canonical form every
    dedup/fingerprint op hashes."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash unit). Built with
    sequence+transform+slice; empty when the doc has < k tokens."""
    words = tokenize(col)
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 24) -> Column:
    """MinHash signature as an array of ``num_hashes`` lexicographic-
    min md5 digests of seed-prefixed shingles.

    md5 is a uniform permutation of the shingle space, so the
    lexicographic min over hex strings is a valid min-hash; equality
    probability across two docs per position = Jaccard similarity
    (Broder's original estimator). Using the hex string (not a parsed
    int) keeps the construction bit-identical in any engine with md5.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash (mod 1e9+7) over the characters of the
    normalized text — an order-sensitive document fingerprint (two
    docs with the same words in different order differ, unlike a
    bag-of-words hash)."""
    chars = F.split(normalize_text(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.coalesce(F.ascii(ch), F.lit(0))) % MOD,
    )


# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately tiny + disjoint where possible: the score is
# |tokens ∩ stopwords(lang)| (distinct hits), argmax wins, ties broken
# by fixed language order.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "nicht", "mit", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une"],
    "es": ["el", "los", "las", "es", "por", "para", "una", "con"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni", "ta", "men"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Distinct stopword types of ``lang`` present in the text."""
    words = F.array_distinct(tokenize(col))
    return F.size(
        F.array_intersect(words, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits, first-listed
    language wins ties (so 'en' is the default for hit-less docs)."""
    scores = [stopword_hits(col, lang) for lang in LANG_ORDER]
    best = F.greatest(*scores)
    expr = F.lit(LANG_ORDER[-1])
    for lang, score in reversed(list(zip(LANG_ORDER[:-1], scores[:-1]))):
        expr = F.when(score == best, F.lit(lang)).otherwise(expr)
    return expr
