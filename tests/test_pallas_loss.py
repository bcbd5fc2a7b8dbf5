"""Fused Pallas multi-loss vs the jnp reference implementation:
values and analytic-VJP gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylc_tpu.ops.losses import LossWeights, multi_loss
from pylc_tpu.ops.pallas.fused_loss import fused_multi_loss


@pytest.mark.parametrize("weighted", [False, True])
def test_fused_loss_values_match_jnp(rng, weighted):
    B, H, W, C = 2, 24, 24, 9
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(B, H, W)))
    cw = jnp.asarray((rng.random(C) + 0.2).astype(np.float32))
    w = LossWeights(weighted=weighted)

    total_ref, aux_ref = multi_loss(logits, target,
                                    class_weights=cw, w=w)
    total, aux = fused_multi_loss(logits, target, cw, w)
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)
    for k in ("ce", "dice", "focal"):
        np.testing.assert_allclose(float(aux[k]), float(aux_ref[k]),
                                   rtol=1e-5, err_msg=k)


def test_fused_loss_nonaligned_pixel_count(rng):
    """Pixel count not a BLOCK_N multiple exercises the padding mask."""
    C = 5
    logits = jnp.asarray(rng.normal(size=(1, 37, 29, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(1, 37, 29)))
    total_ref, _ = multi_loss(logits, target)
    total, _ = fused_multi_loss(logits, target, None, LossWeights())
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_fused_loss_gradient_matches_autodiff(rng, weighted):
    """Analytic backward kernel vs jax.grad of the jnp loss."""
    B, H, W, C = 1, 16, 16, 9
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(B, H, W)))
    cw = jnp.asarray((rng.random(C) + 0.2).astype(np.float32))
    w = LossWeights(weighted=weighted)

    g_ref = jax.grad(
        lambda x: multi_loss(x, target, class_weights=cw, w=w)[0])(logits)
    g = jax.grad(
        lambda x: fused_multi_loss(x, target, cw, w)[0])(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-7)


def test_fused_loss_gradient_scales_with_cotangent(rng):
    C = 4
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(1, 8, 8)))
    w = LossWeights()
    g1 = jax.grad(lambda x: fused_multi_loss(x, target, None, w)[0])(logits)
    g3 = jax.grad(
        lambda x: 3.0 * fused_multi_loss(x, target, None, w)[0])(logits)
    np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g1),
                               rtol=1e-5)


def test_fused_loss_sharded_matches_global(rng):
    """Per-shard kernel + psum partials under shard_map == global loss
    (values and gradients) — the multi-chip training loss path."""
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pylc_tpu.parallel.mesh import get_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = get_mesh(8)
    B, H, W, C = 16, 12, 12, 9
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, size=(B, H, W)))
    w = LossWeights()

    def global_loss(lg):
        return fused_multi_loss(lg, target, None, w)[0]

    @jax.jit
    def sharded_loss(lg, tg):
        def inner(lg_s, tg_s):
            return fused_multi_loss(lg_s, tg_s, None, w,
                                    axis_name="data")[0]
        # check_vma=False: pallas_call outputs don't carry varying-mesh
        # annotations yet
        return shard_map(inner, mesh=mesh, in_specs=(P("data"), P("data")),
                         out_specs=P(), check_vma=False)(lg, tg)

    lg_sh = jax.device_put(logits, NamedSharding(mesh, P("data")))
    tg_sh = jax.device_put(target, NamedSharding(mesh, P("data")))
    np.testing.assert_allclose(float(sharded_loss(lg_sh, tg_sh)),
                               float(global_loss(logits)), rtol=1e-5)

    g_ref = jax.grad(global_loss)(logits)
    g_sh = jax.grad(
        lambda lg: sharded_loss(lg, tg_sh))(lg_sh)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-7)
