"""Similarity search over embedding columns (``array<float>``).

Two tiers, matching the build target's scale story:

- :func:`brute_force_topk` — exact cosine top-k against one query
  vector. Linear scan, JVM-side arithmetic, TakeOrdered top-k: the
  correct baseline at any scale where a full pass is affordable, and
  the verification oracle for the ANN path.
- :func:`lsh_topk` — approximate top-k: random-hyperplane sign
  sketch (shared with ``embedding_cosine_dupes``) prunes the scan to
  buckets within a hamming radius of the query's sketch, then exact
  cosine re-ranks survivors. At 1000 executors the bucket filter is a
  partition-pruned scan, not a broadcast nested loop.

All vector math is built-in higher-order functions (zip_with /
aggregate) — Arrow/pandas never enters the hot path for 64-dim
vectors; a Pandas-UDF BLAS path only pays off at ≥ O(1k) dims.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with+aggregate (strict left-to-right sum —
    deterministic and reproducible across engines)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs_vectorized(a: Column, b: Column) -> Column:
    """Cosine between two vector columns as a vectorized Pandas UDF —
    the verification path for LSH candidate PAIRS, where per-row
    expression evaluation (interpreted, not codegen) dominates once
    candidates number in the tens of thousands. One stacked numpy
    einsum per Arrow batch."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        x = np.vstack(va.to_numpy()).astype(np.float64)
        y = np.vstack(vb.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", x, y)
        den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
        return pd.Series(num / den)

    return cos(a, b)


def query_literal(vec: Sequence[float]) -> Column:
    """A query vector as a literal array<double> column (embedded in
    the plan → shipped once with the task binary, no join needed)."""
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan + per-partition heap (TakeOrdered).
    Deterministic output via (score desc, id asc) ordering."""
    q = query_literal(query)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


@lru_cache(maxsize=16)
def _rademacher(planes: int, dim: int, seed: int):
    """Deterministic ±1 hyperplane matrix (planes × dim), derived from
    md5 so ANY engine can replay it (the DuckDB oracles do): the sign
    for (plane p, dim d) is +1 iff the first hex digit of
    ``md5(f"hp:{seed}:{p}:{d}")`` is odd. Identical on driver and
    every executor — no broadcast, no RNG library dependence."""
    import hashlib

    m = np.empty((planes, dim), dtype=np.int64)
    for p in range(planes):
        for d in range(dim):
            digit = int(
                hashlib.md5(f"hp:{seed}:{p}:{d}".encode()).hexdigest()[0], 16
            )
            m[p, d] = 1 if digit & 1 else -1
    return m


def _quantize_micro(x: np.ndarray) -> np.ndarray:
    """float64 → int64 micro-units via ``floor(x*1e6 + 0.5)``. The
    sketch sign test then runs in exact integer arithmetic: no
    float-summation-order ambiguity between numpy (pairwise sums) and
    a SQL engine's sequential sum, so the sketch is bit-reproducible
    everywhere. 1e-6 resolution is far below any meaningful embedding
    geometry."""
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def sketch_bits(vec: Sequence[float], planes: int = 8, seed: int = 42) -> int:
    """Driver-side sketch of one vector (e.g. the query): bit h of the
    result is sign(planes[h] · quantize(v)) — exact integer math,
    matching :func:`sign_sketch` and the DuckDB replay bit-for-bit."""
    xq = _quantize_micro(np.asarray(vec, dtype=np.float64))
    signs = (_rademacher(planes, len(xq), seed) @ xq) > 0
    return int(sum(1 << h for h, s in enumerate(signs) if s))


def sign_sketch(vec: Column, planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane sign sketch as an integer bitmask (bit h =
    sign of the projection of the micro-quantized vector onto
    hyperplane h — exact int64 arithmetic, engine-portable).
    Vectorized Pandas UDF — one (n × dim) @ (dim × planes) matmul per
    Arrow batch; the expression-level formulation ran interpreted and
    ~20× slower. Hamming distance between sketches is
    ``bit_count(a ^ b)``, JVM-side."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    weights = 1 << np.arange(planes, dtype=np.int64)

    @pandas_udf(T.IntegerType())
    def sketch(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        xq = _quantize_micro(x)
        planes_mat = _rademacher(planes, x.shape[1], seed)  # (p, dim)
        bits = (xq @ planes_mat.T) > 0  # (n, p)
        return pd.Series((bits @ weights).astype("int32"))

    return sketch(vec)


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: keep only vectors whose sign sketch
    is within ``max_hamming`` bits of the query's sketch, then exact
    cosine re-rank. The sketch filter is a cheap JVM predicate — at
    scale, persist the sketch as a materialized column (or partition
    by a sketch prefix) and the filter becomes partition pruning."""
    q = query_literal(query)
    q_mask = sketch_bits(query, planes, seed)
    hamming = F.bit_count(
        sign_sketch(F.col(vec_col), planes, seed).bitwiseXOR(F.lit(q_mask))
    )
    return (
        df.withColumn("_ham", hamming)
        .filter(F.col("_ham") <= max_hamming)
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    k_clusters: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column, Spark-side.

    Assignment is a broadcast cross-join + argmin (distributed, scales
    with the data); the centroid update is a per-cluster numpy mean via
    applyInPandas; only the k×dim centroid matrix ever reaches the
    driver (the loop is driver-coordinated, data never is). Init is
    deterministic: the k lowest-id vectors.
    """
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(F.col(id_col).alias("_id"), _to_double(F.col(vec_col)).alias("_v"))
    centroids = [
        [float(x) for x in r._v]
        for r in base.orderBy("_id").limit(k_clusters).collect()
    ]
    dim = len(centroids[0])
    mean_schema = T.StructType(
        [
            T.StructField("_c", T.IntegerType(), False),
            T.StructField("_v", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def cluster_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.vstack(pdf["_v"].to_numpy())
        return pd.DataFrame({"_c": [int(pdf["_c"].iloc[0])], "_v": [mat.mean(axis=0).tolist()]})

    for _ in range(iters):
        assigned = base.withColumn("_c", _nearest_centroid(F.col("_v"), centroids))
        new = assigned.groupBy("_c").applyInPandas(cluster_mean, mean_schema).collect()
        got = {r._c: list(r._v) for r in new}
        # empty clusters keep their previous centroid
        centroids = [got.get(c, centroids[c]) for c in range(k_clusters)]
    return centroids


def _nearest_centroid(v: Column, centroids: list[list[float]]) -> Column:
    """argmin over squared L2 distance to the centroid matrix, as a
    vectorized Pandas UDF (numpy broadcast: one ‖x-C‖² matrix per
    Arrow batch). An expression-level unrolled version was 10-50×
    slower — k × dim nested higher-order functions run interpreted,
    outside whole-stage codegen."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        # ‖x-c‖² = ‖x‖² - 2x·c + ‖c‖²; ‖x‖² is constant per row → drop
        d = -2.0 * (x @ cmat.T) + (cmat * cmat).sum(axis=1)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return assign(v)


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: restrict the exact cosine scan to the ``nprobe``
    clusters whose centroids are nearest the query, then re-rank.

    At scale the cluster id is a materialized/partition column, so the
    probe filter is partition pruning — the scan reads nprobe/k of the
    data instead of all of it. ``nprobe == k_clusters`` degrades to
    the exact brute-force result (the recall dial)."""
    def sq(a: Sequence[float], b: Sequence[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(range(len(centroids)), key=lambda c: sq(query, centroids[c]))[
        :nprobe
    ]
    q = query_literal(query)
    assigned = df.withColumn(
        "_c", _nearest_centroid(_to_double(F.col(vec_col)), centroids)
    )
    return (
        assigned.filter(F.col("_c").isin([int(c) for c in probe]))
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def topk_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
) -> DataFrame:
    """All-pairs top-k join (each left row → its k nearest right
    rows): broadcast the smaller right side, window-rank per left id.
    For large right sides, swap in the sketch filter first."""
    from pyspark.sql import Window

    r = F.broadcast(
        right.select(
            F.col(right_id).alias("_rid"), F.col(right_vec).alias("_rvec")
        )
    )
    scored = left.select(
        F.col(left_id).alias("id_a"), F.col(left_vec).alias("_lvec")
    ).crossJoin(r).select(
        "id_a",
        F.col("_rid").alias("id_b"),
        F.round(cosine_similarity(F.col("_lvec"), F.col("_rvec")), 6).alias("cosine"),
    ).filter(F.col("id_a") != F.col("id_b"))
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
