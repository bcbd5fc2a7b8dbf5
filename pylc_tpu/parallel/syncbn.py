"""Cross-replica batch-norm statistics via JAX collectives.

The reference implements sync-BN as ~500 lines of Python-thread
master/slave pipes shuttling (sum, ssum, count) between DataParallel
replicas (models/sync_batchnorm/batchnorm.py:38-282, comm.py:18-129,
replicate.py:27-88).  On a TPU mesh the same semantics are a pair of
``lax.psum`` calls inside the jitted program — XLA lowers them to ICI
all-reduces overlapping with compute.

Two usage forms:

1. Under GSPMD pjit (the default training path): flax ``nn.BatchNorm``
   with a batch-sharded input already computes *global* batch statistics
   (jnp.mean over a sharded axis is a cross-replica reduction), so
   nothing extra is needed — this module's ``cross_replica_moments`` is
   used in tests to prove that equivalence.

2. Under ``shard_map``/pmap (explicit-SPMD contexts): pass
   ``axis_name='data'`` to flax BatchNorm (norm_type='syncbatch' in the
   config), which calls into the same psum machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_replica_moments(x: jnp.ndarray, axis_name: str = "data"):
    """Per-channel (mean, var) of an NHWC batch, reduced across replicas.

    The (sum, sum-of-squares, count) triple is the exact payload the
    reference's thread pipes carried (sync_batchnorm/batchnorm.py:90-111);
    here it is two fused psums on ICI.
    """
    n_local = x.shape[0] * x.shape[1] * x.shape[2]
    s = jnp.sum(x, axis=(0, 1, 2))
    ss = jnp.sum(jnp.square(x), axis=(0, 1, 2))
    s, ss, n = jax.lax.psum((s, ss, jnp.float32(n_local)), axis_name)
    mean = s / n
    var = ss / n - jnp.square(mean)
    return mean, var


def sync_batch_norm_apply(x: jnp.ndarray, scale, bias, eps: float = 1e-5,
                          axis_name: str = "data"):
    """Functional sync-BN (training mode) for shard_map contexts."""
    mean, var = cross_replica_moments(x, axis_name)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias
