"""Relational + data-pipeline operators the built-in DataFrame API
lacks: exclusion/as-of/range joins, dedup family, similarity search,
multimodal column plumbing."""

from .joins import asof_join, exclusion_join, range_join  # noqa: F401
