"""Training-data pipeline queries: dedup family, similarity search,
text analysis, multimodal — over documents/embeddings."""

from __future__ import annotations


def register_all() -> None:
    pass
