"""Multi-chip parallelism: row-sharded SPMD rendering over a device mesh."""

from .sharding import ShardedRenderer, make_sharded_render_fn

__all__ = ["ShardedRenderer", "make_sharded_render_fn"]
