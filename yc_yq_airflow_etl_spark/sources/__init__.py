"""Source/sink layer: federated JDBC reads, partitioned parquet lake
writes, and source-side maintenance hooks."""

from .lake import LakeTable  # noqa: F401
from .state import PipelineState  # noqa: F401
