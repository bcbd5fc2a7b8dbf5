"""Cross-replica BN statistics: psum form vs GSPMD-global form.

Proves the design claim in pylc_tpu/parallel/syncbn.py — that under
GSPMD jit with a batch-sharded input, plain global moments equal the
explicit shard_map psum moments (the reference's 500-line thread-pipe
SynchronizedBatchNorm payload)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pylc_tpu.parallel.mesh import get_mesh
from pylc_tpu.parallel.syncbn import cross_replica_moments


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return get_mesh(8)


def test_psum_moments_equal_global_moments(mesh8, rng):
    x = rng.normal(size=(16, 8, 8, 4)).astype(np.float32)

    # explicit-SPMD psum form under shard_map
    from jax import shard_map

    @jax.jit
    def psum_form(x):
        def inner(xs):
            return cross_replica_moments(xs, "data")
        return shard_map(inner, mesh=mesh8, in_specs=P("data"),
                         out_specs=P())(x)

    mean_p, var_p = psum_form(
        jax.device_put(x, NamedSharding(mesh8, P("data"))))

    # GSPMD-global form: plain moments over the sharded batch
    @jax.jit
    def global_form(x):
        m = jnp.mean(x, axis=(0, 1, 2))
        v = jnp.var(x, axis=(0, 1, 2))
        return m, v

    mean_g, var_g = global_form(
        jax.device_put(x, NamedSharding(mesh8, P("data"))))

    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_g),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_g),
                               rtol=1e-4, atol=1e-6)
    # and both equal plain numpy moments
    np.testing.assert_allclose(np.asarray(mean_g),
                               x.mean(axis=(0, 1, 2)), rtol=1e-4, atol=1e-7)


def test_sharded_train_step_matches_single_device(rng):
    """One DP train step on an 8-device mesh must produce the same
    params as the same step on one device (grad all-reduce correctness)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pylc_tpu.config import Config
    from pylc_tpu.parallel.mesh import batch_sharding
    from pylc_tpu.train_state import init_state, make_train_step

    tile = 32
    # SGD: the one-step update stays proportional to the gradient, so
    # reduction-order float noise stays tiny (AdamW's first step is
    # ~sign(grad)*lr, which flips for near-zero grads across orders)
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=16,
                           unet_depth=2, unet_wf=2, dropout=0.0,
                           batch_size=8, optim_type="sgd")
    img = rng.integers(0, 255, (8, tile, tile, 3)).astype(np.uint8)
    mask = rng.integers(0, cfg.n_classes, (8, tile, tile)).astype(np.uint8)
    key = jax.random.PRNGKey(3)

    def run(n_dev):
        state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
        step = make_train_step(cfg, model)
        mesh = get_mesh(n_dev)
        xi = jax.device_put(img, batch_sharding(mesh, 4))
        yi = jax.device_put(mask, batch_sharding(mesh, 3))
        state, metrics = step(state, xi, yi, key)
        return jax.device_get(state.params), float(metrics["total"])

    p1, l1 = run(1)
    p8, l8 = run(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)


def test_syncbatch_train_step_runs_and_matches_batch(rng):
    """Regression for the round-1 crash: ``norm_type='syncbatch'`` must
    run an ACTUAL sharded train step under the GSPMD trainer path (not
    just parse), and — per models/layers.py — produce the same update as
    ``norm_type='batch'`` on a mesh, because GSPMD batch statistics are
    already global over the sharded batch."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pylc_tpu.config import Config
    from pylc_tpu.parallel.mesh import batch_sharding
    from pylc_tpu.train_state import init_state, make_train_step

    tile = 32
    img = rng.integers(0, 255, (8, tile, tile, 3)).astype(np.uint8)
    mask = rng.integers(0, 9, (8, tile, tile)).astype(np.uint8)
    key = jax.random.PRNGKey(3)
    mesh = get_mesh(8)

    def run(norm_type):
        cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                               input_size=tile, output_size=16,
                               unet_depth=2, unet_wf=2, dropout=0.0,
                               batch_size=8, optim_type="sgd",
                               norm_type=norm_type)
        state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
        step = make_train_step(cfg, model)
        xi = jax.device_put(img, batch_sharding(mesh, 4))
        yi = jax.device_put(mask, batch_sharding(mesh, 3))
        state, metrics = step(state, xi, yi, key)  # crashed in round 1
        return (jax.device_get(state.params),
                jax.device_get(state.batch_stats), float(metrics["total"]))

    p_sync, bs_sync, l_sync = run("syncbatch")
    p_batch, bs_batch, l_batch = run("batch")
    np.testing.assert_allclose(l_sync, l_batch, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_sync),
                    jax.tree_util.tree_leaves(p_batch)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(bs_sync),
                    jax.tree_util.tree_leaves(bs_batch)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
