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
@pytest.mark.parametrize("backbone", ["resnet", "xception"])
def test_export_import_roundtrip(tmp_path, rng, backbone):
    """export_deeplab_pth -> convert_deeplab_state_dict reproduces the
    exact parameter + batch-stats trees (both backbones; VERDICT r2
    item 3: the interchange must be two-directional for Xception)."""
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state

    cfg = Config().replace(arch="deeplab", backbone=backbone, ch=3,
                           tile_size=64)
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path / "export.pth")
    export_deeplab_pth(state, cfg, out)

    data = load_reference_pth(out)
    assert "model" in data and "meta" in data
    assert data["meta"]["arch"] == "deeplab"
    p, s = convert_deeplab_state_dict(data["model"], backbone)

    def cmp(a, b, path=""):
        if isinstance(b, dict):
            for k in b:
                cmp(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-6,
                                       err_msg=path)
    cmp(jax.device_get(state.params), p)
    cmp(jax.device_get(state.batch_stats), s)

    # the import covered every exported tensor (no silently-orphaned
    # state_dict keys that the reference would complain about)
    n_exported = len(data["model"])
    n_imported = sum(1 for _ in jax.tree_util.tree_leaves((p, s)))
    assert n_exported == n_imported


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["resnet", "xception"])
def test_pth_model_loads_end_to_end(tmp_path, rng, backbone):
    """A .pth exported in the reference schema loads through
    tester.load_model and produces identical logits."""
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import init_state, make_predict
    from pylc_tpu.tester import load_model
    from pylc_tpu.models.registry import build_model

    cfg = Config().replace(arch="deeplab", backbone=backbone, ch=3,
                           tile_size=64, compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(1))
    out = str(tmp_path / "model.pth")
    export_deeplab_pth(state, cfg, out)

    cfg2, state2, predict2 = load_model(out, Config().replace(
        tile_size=64, compute_dtype="float32"))
    assert cfg2.arch == "deeplab"
    assert cfg2.backbone == backbone

    x = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    predict1 = make_predict(cfg, build_model(cfg, train=False))
    y1 = np.asarray(predict1(state, x))
    y2 = np.asarray(predict2(state2, x))
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_xception_imagenet_zoo_loader(tmp_path):
    """load_xception_imagenet implements the reference's INTENDED
    block-replication zoo mapping (models/backbone/xception.py:258-283;
    as written it loads nothing — DEVIATIONS F13): zoo block11 weights
    land in aligned blocks 11-19, block12 -> block20, conv4 -> conv5,
    separable-internal BNs keep their fresh init."""
    from pylc_tpu.config import Config
    from pylc_tpu.convert import load_xception_imagenet, _unfreeze
    from pylc_tpu.train_state import init_state

    cfg = Config().replace(arch="deeplab", backbone="xception", ch=3,
                           tile_size=64, compute_dtype="float32")
    src_state, _ = init_state(cfg, jax.random.PRNGKey(1))
    tgt_state, _ = init_state(cfg, jax.random.PRNGKey(2))

    sp = _unfreeze(jax.device_get(src_state.params))["backbone"]
    ss = _unfreeze(jax.device_get(src_state.batch_stats))["backbone"]

    # synthesize a zoo-format (Cadene xception) state_dict from the
    # source tree: entry conv1/conv2, blocks 1..11, exit block20 as zoo
    # 'block12', conv3/bn3, conv5/bn5 as zoo 'conv4'/'bn4'; separable
    # pointwise weights are 2-d [O, I] in the zoo file and its
    # SeparableConv2d has no internal BN.
    sd = {}

    def put_conv(key, kern, depthwise=False):
        w = np.asarray(kern).transpose(3, 2, 0, 1)
        sd[key + ".weight"] = torch.tensor(w)

    def put_pointwise(key, kern):
        sd[key + ".weight"] = torch.tensor(
            np.asarray(kern).transpose(3, 2, 0, 1)[:, :, 0, 0])

    def put_bn(key, p, s):
        sd[key + ".weight"] = torch.tensor(np.asarray(p["scale"]))
        sd[key + ".bias"] = torch.tensor(np.asarray(p["bias"]))
        sd[key + ".running_mean"] = torch.tensor(np.asarray(s["mean"]))
        sd[key + ".running_var"] = torch.tensor(np.asarray(s["var"]))

    def put_block(zoo_name, ours):
        bp, bs = sp[ours], ss[ours]
        rep = 0
        i = 0
        while f"sep{i}" in bp:
            put_conv(f"{zoo_name}.rep.{rep}.conv1",
                     bp[f"sep{i}"]["depthwise"]["kernel"], depthwise=True)
            put_pointwise(f"{zoo_name}.rep.{rep}.pointwise",
                          bp[f"sep{i}"]["pointwise"]["kernel"])
            rep += 1
            if f"sepbn{i}" in bp:
                put_bn(f"{zoo_name}.rep.{rep}", bp[f"sepbn{i}"],
                       bs[f"sepbn{i}"])
                rep += 1
            i += 1
        if "skip" in bp:
            put_conv(f"{zoo_name}.skip", bp["skip"]["kernel"])
            put_bn(f"{zoo_name}.skipbn", bp["skipbn"], bs["skipbn"])

    put_conv("conv1", sp["conv1"]["kernel"])
    put_bn("bn1", sp["bn1"], ss["bn1"])
    put_conv("conv2", sp["conv2"]["kernel"])
    put_bn("bn2", sp["bn2"], ss["bn2"])
    for n in range(1, 12):
        put_block(f"block{n}", f"block{n}")
    put_block("block12", "block20")
    put_conv("conv3.conv1", sp["conv3"]["depthwise"]["kernel"],
             depthwise=True)
    put_pointwise("conv3.pointwise", sp["conv3"]["pointwise"]["kernel"])
    put_bn("bn3", sp["bn3"], ss["bn3"])
    put_conv("conv4.conv1", sp["conv5"]["depthwise"]["kernel"],
             depthwise=True)
    put_pointwise("conv4.pointwise", sp["conv5"]["pointwise"]["kernel"])
    put_bn("bn4", sp["bn5"], ss["bn5"])
    sd["fc.weight"] = torch.zeros(1000, 2048)  # dropped by the loader

    pth = str(tmp_path / "xception_zoo.pth")
    torch.save(sd, pth)

    before = _unfreeze(jax.device_get(tgt_state.params))
    new_state = load_xception_imagenet(pth, tgt_state)
    np_ = _unfreeze(jax.device_get(new_state.params))
    ns_ = _unfreeze(jax.device_get(new_state.batch_stats))

    bb = np_["backbone"]
    # entry conv copied
    np.testing.assert_allclose(bb["conv1"]["kernel"],
                               sp["conv1"]["kernel"], atol=1e-6)
    # zoo block11 replicated into aligned blocks 11..19
    for n in range(11, 20):
        np.testing.assert_allclose(
            bb[f"block{n}"]["sep0"]["pointwise"]["kernel"],
            sp["block11"]["sep0"]["pointwise"]["kernel"], atol=1e-6)
    # zoo block12 -> aligned block20
    np.testing.assert_allclose(
        bb["block20"]["sep0"]["depthwise"]["kernel"],
        sp["block20"]["sep0"]["depthwise"]["kernel"], atol=1e-6)
    # zoo conv4/bn4 -> aligned conv5/bn5
    np.testing.assert_allclose(bb["conv5"]["pointwise"]["kernel"],
                               sp["conv5"]["pointwise"]["kernel"], atol=1e-6)
    np.testing.assert_allclose(
        ns_["backbone"]["bn5"]["mean"], ss["bn5"]["mean"], atol=1e-6)
    # bn3 doubled into bn4
    np.testing.assert_allclose(ns_["backbone"]["bn4"]["mean"],
                               ss["bn3"]["mean"], atol=1e-6)
    # separable-internal BN has no zoo source: keeps fresh init
    np.testing.assert_allclose(
        bb["block1"]["sep0"]["bn"]["scale"],
        before["backbone"]["block1"]["sep0"]["bn"]["scale"], atol=1e-6)
    # aspp untouched
    np.testing.assert_allclose(
        np_["aspp"]["proj"]["kernel"], before["aspp"]["proj"]["kernel"],
        atol=1e-6)


def test_xception_imagenet_rejects_garbage(tmp_path):
    """A non-xception file must fail loudly, not train from scratch."""
    from pylc_tpu.config import Config
    from pylc_tpu.convert import load_xception_imagenet
    from pylc_tpu.train_state import init_state

    cfg = Config().replace(arch="deeplab", backbone="xception", ch=3,
                           tile_size=64, compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    pth = str(tmp_path / "junk.pth")
    torch.save({"not_a_weight": torch.zeros(3)}, pth)
    with pytest.raises(ValueError, match="no xception backbone"):
        load_xception_imagenet(pth, state)


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["mobilenet", "drn"])
def test_backbone_imagenet_loader(backbone):
    """load_{mobilenet,drn}_imagenet graft a zoo-format backbone
    state_dict (reference mobilenet.py:130-138 / drn.py:355-361) onto a
    DeepLab state; head keys (classifier/fc) are ignored, non-backbone
    subtrees untouched.  Uses the reference-generated backbone goldens
    as the zoo stand-in (same module, same naming)."""
    import os
    from pylc_tpu.config import Config
    from pylc_tpu.convert import (
        convert_drn_backbone, convert_mobilenet_backbone,
        load_drn_imagenet, load_mobilenet_imagenet, _unfreeze)
    from pylc_tpu.train_state import init_state

    pth = os.path.join(os.path.dirname(__file__), "golden",
                       f"ref_backbone_{backbone}.pth")
    if not os.path.exists(pth):
        if os.path.isdir("/root/reference"):
            import scripts.gen_backbone_goldens as gg
            gg.main()
        else:
            pytest.skip("backbone goldens not generated")

    cfg = Config().replace(arch="deeplab", backbone=backbone, ch=3,
                           tile_size=64, compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    before = _unfreeze(jax.device_get(state.params))

    loader = (load_mobilenet_imagenet if backbone == "mobilenet"
              else load_drn_imagenet)
    conv = (convert_mobilenet_backbone if backbone == "mobilenet"
            else convert_drn_backbone)
    new_state = loader(pth, state)
    got = _unfreeze(jax.device_get(new_state.params))
    want, want_stats = conv(load_reference_pth(pth))

    first = "stem_conv" if backbone == "mobilenet" else "layer0_conv"
    np.testing.assert_allclose(got["backbone"][first]["kernel"],
                               want[first]["kernel"], atol=1e-6)
    got_stats = _unfreeze(jax.device_get(new_state.batch_stats))
    first_bn = "stem_bn" if backbone == "mobilenet" else "layer0_bn"
    np.testing.assert_allclose(got_stats["backbone"][first_bn]["mean"],
                               want_stats[first_bn]["mean"], atol=1e-6)
    # aspp untouched
    np.testing.assert_allclose(got["aspp"]["proj"]["kernel"],
                               before["aspp"]["proj"]["kernel"], atol=1e-6)


@pytest.mark.parametrize("backbone", ["mobilenet", "drn"])
def test_backbone_imagenet_rejects_garbage(backbone, tmp_path):
    """A non-matching file must fail loudly, not train from scratch."""
    from pylc_tpu.convert import load_drn_imagenet, load_mobilenet_imagenet

    loader = (load_mobilenet_imagenet if backbone == "mobilenet"
              else load_drn_imagenet)
    pth = str(tmp_path / "junk.pth")
    torch.save({"not_a_weight": torch.zeros(3)}, pth)
    with pytest.raises(ValueError, match="missing key"):
        loader(pth, object())  # must raise before touching the state
