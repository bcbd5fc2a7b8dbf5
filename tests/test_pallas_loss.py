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
