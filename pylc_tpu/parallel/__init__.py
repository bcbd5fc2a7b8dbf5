"""SPMD parallelism: mesh setup, sharding rules, cross-replica stats."""

from pylc_tpu.parallel.mesh import (  # noqa
    get_mesh, batch_sharding, replicated_sharding, shard_batch,
)
