from .sharding import (
    default_mesh,
    make_sharded_render_fn,
    shard_batch_size,
)

__all__ = ["default_mesh", "make_sharded_render_fn", "shard_batch_size"]
