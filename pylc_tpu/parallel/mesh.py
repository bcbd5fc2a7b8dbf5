"""Device mesh and sharding layout.

The reference has no inter-process communication backend at all — its
only "distributed" machinery is a thread-piped SynchronizedBatchNorm for
single-process DataParallel (reference models/sync_batchnorm/, see
SURVEY.md §2.6/§5.8).  The TPU-native communication layer is this module:
a named ``jax.sharding.Mesh`` over the slice, with

  - batch axis sharded over ``'data'`` (ICI all-reduce for gradients is
    inserted by GSPMD at the pjit boundary),
  - a ``'model'`` axis reserved in the axis-name vocabulary so tensor
    sharding can be added without API changes (unused at these model
    sizes: 8M-60M-param convnets fit per-chip).

Sync-BN = cross-replica mean/var, which under GSPMD is simply BatchNorm
computing stats over the (globally sharded) batch axis; an explicit
``psum``/``pmean`` form for shard_map contexts lives in
pylc_tpu/parallel/syncbn.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_DISTRIBUTED_UP = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) hook: initialize ``jax.distributed`` so
    ``jax.devices()`` spans every host's chips and the 'data' axis of
    :func:`get_mesh` crosses hosts (SURVEY.md §5.8 — the reference has
    no inter-process backend whatsoever).

    Called from the CLI when ``--multihost`` is passed or the standard
    cluster-autodetect env (``JAX_COORDINATOR_ADDRESS`` / TPU pod
    metadata) is present.  With explicit args absent, jax autodetects
    from the environment.  Idempotent; returns whether a multi-process
    runtime is up.
    """
    global _DISTRIBUTED_UP
    if _DISTRIBUTED_UP:
        return True
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_UP = True
    return jax.process_count() > 1


def get_mesh(n_devices: Optional[int] = None,
             axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """Create a 1-D (or reshaped) mesh over the available devices.

    On a v5e slice the default single 'data' axis lays consecutive
    devices along the ICI ring, so gradient all-reduces ride ICI.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # put everything on the leading axis by default
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh with the batch axis sharded over
    'data'.  Batch dims must be divisible by the mesh size (callers pad
    or drop-last, matching the reference DataLoader's drop_last)."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, a.ndim)) for a in arrays)
    return out if len(out) > 1 else out[0]
