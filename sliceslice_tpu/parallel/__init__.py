"""Distribution layer: mesh helpers, sharded corpus scanner, multi-host
bring-up (the capability required by BASELINE.json configs 4-5)."""

from .distributed import gather_positions
from .mesh import DATA_AXIS, NEEDLE_AXIS, corpus_sharding, make_mesh, table_sharding
from .scaling import format_report, measure_scaling
from .shard_scan import (
    ShardedBatchedSearcher,
    sharded_count_cols,
    sharded_find_cols,
    sharded_positions,
)

__all__ = [
    "DATA_AXIS",
    "NEEDLE_AXIS",
    "make_mesh",
    "corpus_sharding",
    "table_sharding",
    "sharded_find_cols",
    "sharded_count_cols",
    "sharded_positions",
    "gather_positions",
    "ShardedBatchedSearcher",
    "measure_scaling",
    "format_report",
]
