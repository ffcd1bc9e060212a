"""Multimodal column handling: opaque ``binary`` payload columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the *decode* step is
stubbed two ways — ``DecodeStub`` raises NotImplementedError (the
honest production placeholder) and ``fake_image_decode`` produces a
deterministic fake (so the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is real and testable). Everything
around the decode (payload schema, batch iteration, feature schema,
partition-parallel execution) is exactly what a real decoder drops
into.

Design for 100 TB of media:
- payloads stay in ``binary`` columns co-located with metadata —
  never driver-collected, never stringified;
- ``mapInPandas`` streams Arrow record batches, so peak executor
  memory is one batch of payloads (bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), not a partition;
- feature extraction emits fixed-schema narrow rows; downstream ops
  are ordinary columnar Spark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)

MOD = 1_000_000_007


class DecodeStub:
    """Production decode placeholder: the real implementation would
    call PIL/av/librosa here. Kept as an explicit NotImplementedError
    so nothing silently ships fake features."""

    def __call__(self, payload: bytes) -> object:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; inject a real decoder or use fake_image_decode"
        )


def fake_image_decode(payload: bytes) -> dict:
    """Deterministic decode stand-in: derives 'features' purely from
    the bytes, so tests exercise the full Arrow round-trip."""
    return {
        "n_bytes": len(payload),
        "byte_sum_mod": sum(payload) % MOD,
        "digest": hashlib.md5(payload).hexdigest(),
    }


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads
    (the testdata has no binary fixtures; UTF-8 bytes of ``text`` give
    a real binary column with verifiable content)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )


def extract_features(media: DataFrame, decode=fake_image_decode) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "n_bytes", "byte_sum_mod", "digest"]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
