"""Multi-device sharding utilities (grid-sharded data parallelism)."""

from .mesh import (grid_sharding, make_mesh, replicated_sharding,
                   shard_points, sharded_safe_set_update)

__all__ = ["make_mesh", "grid_sharding", "replicated_sharding",
           "shard_points", "sharded_safe_set_update"]
