import jax.numpy as jnp
import numpy as np

from pylc_tpu.ops.crf import CRFParams, make_crf, mean_field


def test_crf_preserves_distribution(rng):
    H, W, C = 24, 24, 5
    probs = rng.random((H, W, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    guide = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    out = np.asarray(mean_field(jnp.asarray(probs), jnp.asarray(guide),
                                CRFParams(n_iters=2, radius=2)))
    assert out.shape == (H, W, C)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    assert np.all(out >= 0)


def test_crf_denoises_salt_and_pepper(rng):
    """Mean-field with edge-aware messages must clean isolated label
    noise inside homogeneous color regions."""
    H, W, C = 32, 32, 3
    # guide: two flat color regions with a vertical edge
    guide = np.zeros((H, W, 3), np.uint8)
    guide[:, W // 2:] = 200
    # unary: mostly class 0 on the left, class 1 on the right, with noise
    true = np.zeros((H, W), np.int32)
    true[:, W // 2:] = 1
    noisy = true.copy()
    noise_idx = rng.choice(H * W, size=40, replace=False)
    noisy.ravel()[noise_idx] = rng.integers(0, C, size=40)
    probs = np.full((H, W, C), 0.05, np.float32)
    np.put_along_axis(probs, noisy[..., None], 0.9, axis=-1)
    probs /= probs.sum(-1, keepdims=True)

    crf = make_crf(n_iters=5, radius=3, w_appearance=4.0)
    refined = np.asarray(crf(jnp.asarray(probs), jnp.asarray(guide)))
    pred = refined.argmax(-1)
    before = (noisy != true).mean()
    after = (pred != true).mean()
    assert after < before, f"CRF did not denoise: {before} -> {after}"
    assert after < 0.01


def test_crf_respects_edges(rng):
    """The appearance kernel must not smooth across a strong color edge
    even when the smoothness kernel pulls that way."""
    H, W, C = 16, 16, 2
    guide = np.zeros((H, W, 3), np.uint8)
    guide[:, W // 2:] = 255
    probs = np.full((H, W, C), 0.5, np.float32)
    probs[:, :W // 2, 0] = 0.8
    probs[:, :W // 2, 1] = 0.2
    probs[:, W // 2:, 0] = 0.2
    probs[:, W // 2:, 1] = 0.8
    crf = make_crf(n_iters=5, radius=3, w_appearance=5.0, w_smoothness=0.5)
    refined = np.asarray(crf(jnp.asarray(probs), jnp.asarray(guide)))
    pred = refined.argmax(-1)
    assert (pred[:, :W // 2] == 0).all()
    assert (pred[:, W // 2:] == 1).all()


def test_pallas_crf_iteration_matches_xla(rng):
    """The Pallas VMEM-blocked iteration must reproduce the jnp
    shifted-add mean-field exactly (interpret mode on CPU)."""
    from pylc_tpu.ops.crf import CRFParams, mean_field
    H, W, C = 40, 72, 7
    probs = rng.random((H, W, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    guide = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    base = dict(n_iters=3, radius=2, downsample=1)
    want = np.asarray(mean_field(jnp.asarray(probs), jnp.asarray(guide),
                                 CRFParams(**base, backend="xla")))
    got = np.asarray(mean_field(jnp.asarray(probs), jnp.asarray(guide),
                                CRFParams(**base, backend="pallas")))
    np.testing.assert_allclose(got, want, atol=2e-6)
