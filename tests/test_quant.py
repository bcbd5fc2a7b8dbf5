"""int8 PTQ (pylc_tpu/quant.py): numerics of the quantized conv, the
calibration interceptor, and the drop-in quantized predict path.

The MP/s and mask-agreement measurements on the real chip live in
scripts/quant_experiment.py / docs/PERF_ROUND5.md; these tests pin the
machinery on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from pylc_tpu.quant import (Q_MAX, calibrate_absmax,
                            calibration_batches_from_db, int8_interceptor,
                            make_predict_int8)


class TinyNet(nn.Module):
    """conv -> relu -> strided conv -> dilated conv (the attribute
    shapes the flagship uses: SAME padding, strides, rhs dilation)."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), strides=(2, 2), name="c2")(x)
        x = nn.relu(x)
        x = nn.Conv(4, (3, 3), kernel_dilation=(2, 2), use_bias=False,
                    name="c3")(x)
        return x


@pytest.fixture(scope="module")
def tiny():
    net = TinyNet()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    variables = net.init(rng, x)
    return net, variables, x


def test_calibration_records_every_conv(tiny):
    net, variables, x = tiny
    scales = calibrate_absmax(net, variables, [x, x * 2.0])
    assert set(scales) == {"c1", "c2", "c3"}
    # absmax over batches: the 2x batch must win
    assert scales["c1"] == pytest.approx(float(jnp.abs(x * 2).max()))
    assert all(v > 0 for v in scales.values())


def test_quantized_forward_close_to_float(tiny):
    net, variables, x = tiny
    scales = calibrate_absmax(net, variables, [x])
    ref = net.apply(variables, x)
    with nn.intercept_methods(int8_interceptor(scales)):
        got = net.apply(variables, x)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    # int8 symmetric quant: ~1% relative error per conv, 3 convs deep.
    err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.05, f"relative error {err:.4f}"
    # and it must actually be a different computation (quantized)
    assert float(jnp.abs(got - ref).max()) > 0


def test_uncalibrated_convs_run_float(tiny):
    net, variables, x = tiny
    scales = calibrate_absmax(net, variables, [x])
    scales.pop("c2")  # pretend c2 was never seen
    with nn.intercept_methods(int8_interceptor(scales)):
        got = net.apply(variables, x)
    assert np.isfinite(np.asarray(got)).all()


def test_quantized_predict_drop_in(tmp_path):
    """make_predict_int8 serves the flagship eval model exactly where
    make_predict does, and its logits track the float path."""
    from pylc_tpu.config import Config
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.train_state import init_state, make_predict

    cfg = Config().replace(arch="deeplab", backbone="mobilenet", ch=3,
                           tile_size=64, compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(2))
    model_eval = build_model(cfg, train=False)

    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)

    from pylc_tpu.train_state import _prepare_batch
    calib, _ = _prepare_batch(cfg, jnp.asarray(tiles), None, None)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scales = calibrate_absmax(model_eval, variables, [calib], train=False)
    assert len(scales) > 10  # every conv in the net got a scale

    ref = make_predict(cfg, model_eval)(state, tiles)
    got = make_predict_int8(cfg, model_eval, scales)(state, tiles)
    assert got.shape == ref.shape
    err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.15, f"relative error {err:.4f}"
    # argmax class maps mostly agree even at random init (low-margin)
    agree = float((jnp.argmax(got, -1) == jnp.argmax(ref, -1)).mean())
    assert agree > 0.9, f"argmax agreement {agree:.3f}"


def test_calibration_batches_from_db(tmp_path):
    from pylc_tpu.config import Config
    from pylc_tpu.db.database import TileDB

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (12, 3, 32, 32)).astype(np.uint8)
    masks = rng.integers(0, 9, (12, 32, 32)).astype(np.uint8)
    cfg = Config().replace(ch=3, tile_size=32, n_tiles=12)
    path = str(tmp_path / "q.h5")
    TileDB.save(path, imgs, masks, cfg)

    batches = calibration_batches_from_db(path, cfg, n_tiles=10, batch=4)
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    assert all(b.shape[1:] == (32, 32, 3) for b in batches)
    # normalized (not raw u8 range)
    assert float(jnp.abs(batches[0]).max()) < 50.0
