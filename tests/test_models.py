import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pylc_tpu.models.layers import resize_bilinear_align_corners
from pylc_tpu.models.unet import UNet
from pylc_tpu.models.res_unet import ResUNet


def _norm(train=True):
    from functools import partial
    return partial(nn.BatchNorm, use_running_average=not train,
                   momentum=0.9, epsilon=1e-5)


def test_resize_align_corners_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    x = rng.random((1, 7, 9, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 14, 18))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(14, 18), mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unet_valid_conv_geometry_512_to_324():
    """The load-bearing 512 -> 324 geometry (reference config.py:228-236).
    Uses jax.eval_shape so no convs actually run."""
    model = UNet(n_classes=9, depth=5, wf=6, norm=_norm(False), act=nn.relu,
                 dropout=0.0)
    x = jnp.zeros((1, 512, 512, 1))
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False),
        jax.eval_shape(lambda x: model.init(jax.random.PRNGKey(0), x,
                                            train=False), x), x)
    assert out.shape == (1, 324, 324, 9)


def test_unet_tiny_forward_and_grad(rng):
    model = UNet(n_classes=4, depth=3, wf=3, norm=_norm(True), act=nn.relu,
                 dropout=0.1)
    x = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out, _ = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out.shape == (2, 24, 24, 4)  # 64 -> 24 for depth 3
    assert np.all(np.isfinite(np.asarray(out)))


def test_resunet_tiny_forward(rng):
    model = ResUNet(n_classes=4, depth=3, wf=3, act=nn.relu)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 24, 24, 4)


def test_resnet_backbone_tiny_forward(rng):
    """Shrunk ResNet (1-1-1-MG blocks): checks the OS16 stride/dilation
    wiring and low-level feature tap."""
    from pylc_tpu.models import resnet as rn

    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    backbone = rn.ResNet101(output_stride=16, norm=_norm(False),
                            layers=(1, 1, 1, 1))
    v = backbone.init(jax.random.PRNGKey(0), x)
    feat, ll = backbone.apply(v, x)
    assert feat.shape == (1, 4, 4, 2048)   # 64 / 16
    assert ll.shape == (1, 16, 16, 256)    # 64 / 4


def test_aspp_decoder_shapes(rng):
    from pylc_tpu.models.aspp import ASPP
    from pylc_tpu.models.deeplab import DeepLabDecoder

    feat = jnp.asarray(rng.random((1, 4, 4, 2048)).astype(np.float32))
    ll = jnp.asarray(rng.random((1, 16, 16, 256)).astype(np.float32))
    aspp = ASPP(output_stride=16, norm=_norm(False))
    v = aspp.init(jax.random.PRNGKey(0), feat, train=False)
    y = aspp.apply(v, feat, train=False)
    assert y.shape == (1, 4, 4, 256)
    dec = DeepLabDecoder(n_classes=5, norm=_norm(False))
    v = dec.init(jax.random.PRNGKey(0), y, ll, train=False)
    out = dec.apply(v, y, ll, train=False)
    assert out.shape == (1, 16, 16, 5)


def test_xception_tiny_forward(rng):
    from pylc_tpu.models.xception import AlignedXception
    model = AlignedXception(output_stride=16, norm=_norm(False))
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    feat, ll = model.apply(v, x)
    assert feat.shape == (1, 4, 4, 2048)
    assert ll.shape == (1, 16, 16, 128)


def test_prepare_batch_grayscale_deeplab_stacking(rng):
    """ch=1 inputs are normalized then stacked to 3 channels for DeepLab
    (reference models/model.py:310-311, 416-435)."""
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import _prepare_batch
    cfg = Config().replace(arch="deeplab", ch=1,
                           px_mean=[100.0], px_std=[20.0])
    img = rng.integers(0, 256, (2, 16, 16, 1)).astype(np.uint8)
    x, _ = _prepare_batch(cfg, jnp.asarray(img), None, None)
    assert x.shape == (2, 16, 16, 3)
    want = ((img[..., 0].astype(np.float32) - 100.0) / 20.0) / 255.0
    for c in range(3):
        np.testing.assert_allclose(np.asarray(x[..., c]), want, rtol=1e-6)


def test_rgb2hex_matches_schema():
    from pylc_tpu.utils.imageio import rgb2hex
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    s = Schema.load(DEFAULT_SCHEMA)
    for rgb, hx in zip(s.palette_rgb, s.palette_hex):
        assert rgb2hex(rgb) == hx


def test_instance_norm_builds_and_runs(rng):
    """norm_type='instance' is a documented choice (cli --normalize);
    it must construct (flax needs num_groups=None with group_size)."""
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_train_step

    cfg = Config().replace(arch="unet", ch=3, tile_size=32, input_size=32,
                           output_size=16, unet_depth=2, unet_wf=2,
                           norm_type="instance", dropout=0.0, batch_size=2)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
    step = make_train_step(cfg, model)
    img = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    mask = rng.integers(0, 9, (2, 32, 32)).astype(np.uint8)
    state, m = step(state, img, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total"]))


def test_resunet_respects_norm_type(rng):
    """ResUNet must honour cfg.norm_type (it used to hardcode
    BatchNorm, which crashed under --normalize layer because the train
    step only tracks batch_stats when norm_type is batch-like)."""
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_train_step

    cfg = Config().replace(arch="resunet", ch=3, tile_size=32,
                           input_size=32, output_size=16, unet_depth=2,
                           unet_wf=2, norm_type="layer", batch_size=2)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
    assert not state.batch_stats  # LayerNorm keeps no running stats
    step = make_train_step(cfg, model)
    img = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    mask = rng.integers(0, 9, (2, 32, 32)).astype(np.uint8)
    state, m = step(state, img, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total"]))


def test_mobilenet_tiny_forward(rng):
    """MobileNetV2 backbone: OS16 stride/dilation plan, 320-ch output,
    24-ch low-level tap after features[0:4] (ref mobilenet.py:122-124)."""
    from pylc_tpu.models.mobilenet import MobileNetV2

    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    model = MobileNetV2(output_stride=16, norm=_norm(False))
    v = model.init(jax.random.PRNGKey(0), x)
    feat, ll = model.apply(v, x)
    assert feat.shape == (1, 4, 4, 320)
    assert ll.shape == (1, 16, 16, 24)


def test_mobilenet_os8_forward(rng):
    from pylc_tpu.models.mobilenet import MobileNetV2

    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    model = MobileNetV2(output_stride=8, norm=_norm(False))
    v = model.init(jax.random.PRNGKey(0), x)
    feat, ll = model.apply(v, x)
    assert feat.shape == (1, 8, 8, 320)
    assert ll.shape == (1, 16, 16, 24)


def test_drn_tiny_forward(rng):
    """DRN-D-54: natively OS8, 512-ch output after the de-gridding
    tail, 256-ch low-level tap after layer3 (ref drn.py:227-229)."""
    from pylc_tpu.models.drn import DRN54

    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    model = DRN54(norm=_norm(False))
    v = model.init(jax.random.PRNGKey(0), x)
    feat, ll = model.apply(v, x)
    assert feat.shape == (1, 8, 8, 512)
    assert ll.shape == (1, 16, 16, 256)


@pytest.mark.parametrize("backbone", ["mobilenet", "drn"])
def test_deeplab_new_backbones_forward_and_grad(rng, backbone):
    """DeepLab with the round-3 backbones: full forward to input
    resolution plus one grad step (train-path sanity)."""
    from pylc_tpu.models.deeplab import DeepLab

    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    model = DeepLab(n_classes=5, backbone=backbone, norm=_norm(True))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (1, 64, 64, 5)
    assert y.dtype == jnp.float32

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_train_step_with_rbg_step_key(rng):
    """The production per-step key is 'rbg' (TPU RngBitGenerator,
    docs/PERF_ROUND3.md): a typed rbg key must flow through
    split/bernoulli/dropout inside the jitted step, and both impls
    must produce finite losses."""
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import (init_state, make_step_key,
                                      make_train_step)

    cfg = Config().replace(arch="unet", ch=3, tile_size=32, input_size=32,
                           output_size=16, unet_depth=2, unet_wf=2,
                           batch_size=2)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
    step = make_train_step(cfg, model)
    img = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    mask = rng.integers(0, 9, (2, 32, 32)).astype(np.uint8)
    for impl in ("rbg", "threefry2x32"):
        key = make_step_key(7, impl)
        key, sub = jax.random.split(key)
        # the step donates state — thread it instead of reusing
        state, m = step(state, img, mask, sub)
        assert np.isfinite(float(m["total"])), impl


def test_head_lr_mult_differential_updates(rng):
    """cfg.head_lr_mult trains the ASPP+decoder head at mult x the
    backbone LR — the reference's get_1x/get_10x_lr_params split
    (models/architectures/deeplab.py:57-79) that its Model never wires
    into the optimizer.  With plain SGD the first update is
    -lr * clipped_grad, so vs a mult=1 run the backbone update must be
    identical and the head update exactly mult x."""
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_train_step

    # lr large enough that one SGD update is far above f32 resolution
    # of the ~0.1-magnitude params (at the 1e-4 default the deltas sit
    # at the rounding floor and the 10x ratio is unobservable)
    base = Config().replace(arch="deeplab", backbone="mobilenet", ch=3,
                            tile_size=32, input_size=32, output_size=32,
                            batch_size=2, optim_type="sgd", momentum=0.0,
                            sched_type="anneal", dropout=0.0, lr=0.05,
                            compute_dtype="float32")
    img = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    mask = rng.integers(0, 9, (2, 32, 32)).astype(np.uint8)

    def one_step(mult):
        cfg = base.replace(head_lr_mult=mult)
        state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
        p0 = jax.device_get(state.params)
        step = make_train_step(cfg, model)
        state, _ = step(state, img, mask, jax.random.PRNGKey(1))
        return p0, jax.device_get(state.params)

    p0a, p1a = one_step(1.0)
    p0b, p1b = one_step(10.0)

    def leaf(tree, *path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    # same init either way
    np.testing.assert_array_equal(leaf(p0a, "backbone", "stem_conv",
                                       "kernel"),
                                  leaf(p0b, "backbone", "stem_conv",
                                       "kernel"))
    d_bb_a = leaf(p1a, "backbone", "stem_conv", "kernel") - \
        leaf(p0a, "backbone", "stem_conv", "kernel")
    d_bb_b = leaf(p1b, "backbone", "stem_conv", "kernel") - \
        leaf(p0b, "backbone", "stem_conv", "kernel")
    np.testing.assert_allclose(d_bb_b, d_bb_a, rtol=5e-3, atol=1e-7)

    d_hd_a = leaf(p1a, "decoder", "head", "kernel") - \
        leaf(p0a, "decoder", "head", "kernel")
    d_hd_b = leaf(p1b, "decoder", "head", "kernel") - \
        leaf(p0b, "decoder", "head", "kernel")
    assert np.abs(d_hd_a).max() > 0
    np.testing.assert_allclose(d_hd_b, 10.0 * d_hd_a, rtol=5e-3,
                               atol=1e-7)
