"""torch->jax conversion parity, tested at the layer level against torch
primitives (no reference code imported), plus export/import round-trip."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import linen as nn

from pylc_tpu.convert import (
    _conv_kernel, convert_deeplab_state_dict, convert_resnet_backbone,
    export_deeplab_pth, load_reference_pth,
)


def test_conv_kernel_parity_dilated(rng):
    """torch Conv2d(3x3, dilation=2, pad=2) == flax Conv with converted
    kernel — the bottleneck conv2 configuration."""
    tconv = torch.nn.Conv2d(4, 6, 3, padding=2, dilation=2, bias=False)
    x = rng.random((1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.tensor(x)).numpy()

    kernel = _conv_kernel(tconv.weight)
    fconv = nn.Conv(6, (3, 3), padding=[(2, 2), (2, 2)],
                    kernel_dilation=(2, 2), use_bias=False)
    out = fconv.apply({"params": {"kernel": jnp.asarray(kernel)}},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depthwise_conv_parity(rng):
    """torch groups=C depthwise == flax feature_group_count with the
    converted kernel (Xception separable conv)."""
    C = 6
    tconv = torch.nn.Conv2d(C, C, 3, padding=1, groups=C, bias=False)
    x = rng.random((1, C, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.tensor(x)).numpy()
    kernel = _conv_kernel(tconv.weight, depthwise=True)
    fconv = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=C, use_bias=False)
    got = fconv.apply({"params": {"kernel": jnp.asarray(kernel)}},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, atol=1e-5)


def test_batchnorm_parity(rng):
    tbn = torch.nn.BatchNorm2d(5).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.random(5).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.random(5).astype(np.float32)))
        tbn.running_mean.copy_(
            torch.tensor(rng.random(5).astype(np.float32)))
        tbn.running_var.copy_(
            torch.tensor((rng.random(5) + 0.5).astype(np.float32)))
    x = rng.random((2, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.tensor(x)).numpy()
    fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                        "var": jnp.asarray(tbn.running_var.numpy())},
    }
    got = fbn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, atol=1e-5)


def test_resnet_state_dict_conversion_structure(rng):
    """A synthetic reference-naming state_dict lands in the right flax
    slots with transposed kernels."""
    def t(*shape):
        return torch.tensor(rng.random(shape).astype(np.float32))

    sd = {
        "conv1.weight": t(64, 3, 7, 7),
        "bn1.weight": t(64), "bn1.bias": t(64),
        "bn1.running_mean": t(64), "bn1.running_var": t(64),
        "layer1.0.conv1.weight": t(64, 64, 1, 1),
        "layer1.0.bn1.weight": t(64), "layer1.0.bn1.bias": t(64),
        "layer1.0.bn1.running_mean": t(64),
        "layer1.0.bn1.running_var": t(64),
        "layer1.0.conv2.weight": t(64, 64, 3, 3),
        "layer1.0.bn2.weight": t(64), "layer1.0.bn2.bias": t(64),
        "layer1.0.bn2.running_mean": t(64),
        "layer1.0.bn2.running_var": t(64),
        "layer1.0.conv3.weight": t(256, 64, 1, 1),
        "layer1.0.bn3.weight": t(256), "layer1.0.bn3.bias": t(256),
        "layer1.0.bn3.running_mean": t(256),
        "layer1.0.bn3.running_var": t(256),
        "layer1.0.downsample.0.weight": t(256, 64, 1, 1),
        "layer1.0.downsample.1.weight": t(256),
        "layer1.0.downsample.1.bias": t(256),
        "layer1.0.downsample.1.running_mean": t(256),
        "layer1.0.downsample.1.running_var": t(256),
    }
    p, s = convert_resnet_backbone(sd)
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        p["conv1"]["kernel"],
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    assert p["layer1_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 256)
    assert s["layer1_0"]["bn2"]["mean"].shape == (64,)


@pytest.mark.slow
def test_export_import_roundtrip(tmp_path, rng):
    """export_deeplab_pth -> convert_deeplab_state_dict reproduces the
    exact parameter tree (full ResNet101 DeepLab)."""
    from functools import partial
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state

    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           tile_size=64)
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path / "export.pth")
    export_deeplab_pth(state, cfg, out)

    data = load_reference_pth(out)
    assert "model" in data and "meta" in data
    assert data["meta"]["arch"] == "deeplab"
    p, s = convert_deeplab_state_dict(data["model"], "resnet")

    orig_p = jax.device_get(state.params)
    def cmp(a, b, path=""):
        if isinstance(b, dict):
            for k in b:
                cmp(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-6,
                                       err_msg=path)
    cmp(orig_p, p)


@pytest.mark.slow
def test_pth_model_loads_end_to_end(tmp_path, rng):
    """A .pth exported in the reference schema loads through
    tester.load_model and produces identical logits."""
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_predict
    from pylc_tpu.tester import load_model
    from pylc_tpu.models.registry import build_model

    cfg = Config().replace(arch="deeplab", backbone="resnet", ch=3,
                           tile_size=64, compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(1))
    out = str(tmp_path / "model.pth")
    export_deeplab_pth(state, cfg, out)

    cfg2, state2, predict2 = load_model(out, Config().replace(
        tile_size=64, compute_dtype="float32"))
    assert cfg2.arch == "deeplab"

    x = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    predict1 = make_predict(cfg, build_model(cfg, train=False))
    y1 = np.asarray(predict1(state, x))
    y2 = np.asarray(predict2(state2, x))
    np.testing.assert_allclose(y1, y2, atol=1e-5)
