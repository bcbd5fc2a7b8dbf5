"""Golden parity against the RUNNING reference implementation.

Fixtures in tests/golden/reference_goldens.npz were produced by
executing /root/reference's own functions (scripts/gen_goldens.py) on
deterministic inputs.  These tests are hermetic — the reference tree is
only needed to regenerate.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "reference_goldens.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def palette():
    from pylc_tpu.config import Schema, DEFAULT_SCHEMA
    return np.asarray(Schema.load(DEFAULT_SCHEMA).palette_rgb, np.uint8)


def test_class_encode_golden(g, palette):
    """Pixel-exact vs reference class_encode incl. the default-to-1
    quirk (utils/tools.py:412-449)."""
    from pylc_tpu.ops.palette import class_encode
    got = np.asarray(class_encode(g["encode_in_rgb"], palette))
    np.testing.assert_array_equal(got, g["encode_out"])


def test_colourize_golden(g, palette):
    from pylc_tpu.ops.palette import colourize
    got = np.asarray(colourize(g["encode_out"].astype(np.uint8), palette))
    np.testing.assert_array_equal(got, g["colourize_out"])


def test_map_palette_golden(g):
    from pylc_tpu.ops.palette import map_palette
    got = np.asarray(map_palette(g["map_palette_in"], g["map_palette_key"]))
    np.testing.assert_array_equal(got, g["map_palette_out"])


def test_adjust_to_tile_dims_golden(g):
    from pylc_tpu.ops.tiles import adjust_to_tile_dims
    for w, h, wf, hf, crop in g["adjust_dims"]:
        got_wf, got_hf, got_crop = adjust_to_tile_dims(
            int(w), int(h), 512, 256)
        assert (got_wf, got_hf, got_crop) == (wf, hf, crop), \
            f"{w}x{h}: {(got_wf, got_hf, got_crop)} vs {(wf, hf, crop)}"


def test_reconstruct_golden_argmax(g, palette):
    """Full-pipeline stitch parity vs the reference's sequential
    reconstruct: colour masks must agree everywhere except the
    quadruple-overlap corners it double-softmaxes (D1)."""
    from pylc_tpu.ops.tiles import stitch_logits_to_mask
    from pylc_tpu.ops.palette import colourize

    logits = g["reconstruct_logits"]  # [N, C, t, t]
    want = g["reconstruct_mask_rgb"]
    tile, stride = 64, 32
    n_rows, n_cols = 3, 4
    tiles_nhwc = np.transpose(logits, (0, 2, 3, 1))
    cm = np.asarray(stitch_logits_to_mask(tiles_nhwc, n_rows, n_cols,
                                          tile, stride))
    got = np.asarray(colourize(cm, palette))
    assert got.shape == want.shape
    agree = np.mean(np.all(got == want, axis=-1))
    assert agree > 0.97, f"colour-mask agreement {agree:.4f}"
    # exact off the corner zones
    mask = np.ones(cm.shape, bool)
    olap = tile - stride
    for i in range(1, n_rows):
        for j in range(1, n_cols):
            mask[i * stride:i * stride + olap,
                 j * stride:j * stride + olap] = False
    np.testing.assert_array_equal(got[mask], want[mask])


def test_multi_loss_golden(g):
    """Loss values vs the reference MultiLoss forward
    (models/modules/loss.py:107-194)."""
    from pylc_tpu.ops.losses import multi_loss
    pred = np.transpose(g["loss_pred"], (0, 2, 3, 1))  # NCHW -> NHWC
    tgt = g["loss_target"]
    ce_ref, dice_ref, focal_ref, total_ref = g["loss_values"]
    total, aux = multi_loss(pred, tgt)
    np.testing.assert_allclose(float(aux["ce"]), ce_ref, rtol=1e-5)
    np.testing.assert_allclose(float(aux["dice"]), dice_ref, rtol=1e-5)
    np.testing.assert_allclose(float(aux["focal"]), focal_ref, rtol=1e-4)
    np.testing.assert_allclose(float(total), total_ref, rtol=1e-4)


def test_profile_weights_golden(g):
    probs = g["profile_probs"]
    weights = 1.0 / np.log(1.02 + probs)
    weights = weights / np.max(weights)
    np.testing.assert_allclose(weights, g["profile_weights"], rtol=1e-12)


def _model_golden(backbone):
    pth = os.path.join(os.path.dirname(__file__), "golden",
                       f"ref_deeplab_{backbone}.pth")
    io = os.path.join(os.path.dirname(__file__), "golden",
                      f"ref_deeplab_{backbone}_io.npz")
    if not (os.path.exists(pth) and os.path.exists(io)):
        # .pth fixtures are 200+ MB and not committed; regenerate from
        # the reference checkout when present
        if os.path.isdir("/root/reference"):
            import scripts.gen_goldens as gg
            gg.gen_model_goldens()
        else:
            pytest.skip("model goldens not generated")
    return pth, io


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["resnet", "xception"])
def test_converted_deeplab_matches_reference_logits(backbone):
    """THE checkpoint-parity test: a reference-format torch .pth
    (produced by executing the reference's DeepLab) converted to our
    flax DeepLab must reproduce the reference's logits."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from flax import linen as nn
    from pylc_tpu.convert import convert_deeplab_state_dict, \
        load_reference_pth
    from pylc_tpu.models.deeplab import DeepLab

    pth, io = _model_golden(backbone)
    data = load_reference_pth(pth)
    params, stats = convert_deeplab_state_dict(data["model"], backbone)
    golden = np.load(io)
    x = np.transpose(golden["x"], (0, 2, 3, 1))  # NCHW -> NHWC
    want = np.transpose(golden["logits"], (0, 2, 3, 1))

    norm = partial(nn.BatchNorm, use_running_average=True, momentum=0.9,
                   epsilon=1e-5)
    model = DeepLab(n_classes=9, backbone=backbone, norm=norm, dtype=None)
    variables = {"params": params, "batch_stats": stats}
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    assert got.shape == want.shape
    # a random-init net with randomized BN stats amplifies activations to
    # ~5e5, so compare at a scale-relative tolerance (f32 accumulation
    # order differs between conv backends)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=max(5e-4, 1e-5 * scale))
    # argmax masks identical up to float ties.  A random-init net has
    # near-zero logits everywhere, so exact ties flip freely (xception:
    # ~0.05% of pixels at |diff| < 2e-4); trained models sit far from
    # ties.  The allclose above is the primary criterion.
    agree = np.mean(got.argmax(-1) == want.argmax(-1))
    assert agree >= 0.999, f"argmax agreement {agree}"


def _backbone_golden(which):
    pth = os.path.join(os.path.dirname(__file__), "golden",
                       f"ref_backbone_{which}.pth")
    io = os.path.join(os.path.dirname(__file__), "golden",
                      f"ref_backbone_{which}_io.npz")
    if not (os.path.exists(pth) and os.path.exists(io)):
        if os.path.isdir("/root/reference"):
            import scripts.gen_backbone_goldens as gg
            gg.main()
        else:
            pytest.skip("backbone goldens not generated")
    return pth, io


@pytest.mark.slow
@pytest.mark.parametrize("which", ["mobilenet", "drn"])
def test_converted_backbone_matches_reference_features(which):
    """Round-3 backbones vs the EXECUTING reference backbone modules.

    The reference DeepLab cannot construct mobilenet/drn (deeplab.py:
    23-26), so these goldens drive the reference's backbone nn.Modules
    directly (scripts/gen_backbone_goldens.py): random params +
    randomized BN running stats, eval forward.  The converted flax
    backbone must reproduce (feat, low_level) — this pins every block's
    padding/stride/dilation plan, incl. MobileNetV2's whole-block
    fixed_padding, to the reference."""
    import jax.numpy as jnp
    from functools import partial
    from flax import linen as nn
    from pylc_tpu.convert import (convert_drn_backbone,
                                  convert_mobilenet_backbone,
                                  load_reference_pth)

    pth, io = _backbone_golden(which)
    sd = load_reference_pth(pth)
    if which == "mobilenet":
        from pylc_tpu.models.mobilenet import MobileNetV2
        params, stats = convert_mobilenet_backbone(sd)
        norm = partial(nn.BatchNorm, use_running_average=True,
                       momentum=0.9, epsilon=1e-5)
        model = MobileNetV2(output_stride=16, norm=norm)
    else:
        from pylc_tpu.models.drn import DRN54
        params, stats = convert_drn_backbone(sd)
        norm = partial(nn.BatchNorm, use_running_average=True,
                       momentum=0.9, epsilon=1e-5)
        model = DRN54(norm=norm)

    golden = np.load(io)
    x = np.transpose(golden["x"], (0, 2, 3, 1))  # NCHW -> NHWC
    feat, ll = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x))
    for got, want_nchw in ((feat, golden["feat"]),
                           (ll, golden["low_level"])):
        want = np.transpose(want_nchw, (0, 2, 3, 1))
        got = np.asarray(got)
        assert got.shape == want.shape
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=1e-3,
                                   atol=max(5e-4, 1e-5 * scale))
