"""Serving-artifact export: the serialized StableHLO program must
reproduce the live Segmenter bit-for-bit, through the file round-trip,
without touching model code.

Reference analogue: none — the reference deploys by unpickling the
whole torch module (models/model.py:29-120); this is the TPU-native
replacement (pylc_tpu/export.py docstring).
"""

import numpy as np
import pytest

from pylc_tpu.config import Config
from pylc_tpu.export import ServingModel, save_artifact
from pylc_tpu.infer import Segmenter
from pylc_tpu.models.registry import build_model
from pylc_tpu.train_state import init_state, make_predict


def _tiny_segmenter(crf=None):
    import jax
    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32", id="tiny-export")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    return cfg, Segmenter(cfg, state, predict, batch_size=2, crf=crf)


def test_artifact_round_trip_matches_live_segmenter(rng, tmp_path):
    cfg, seg = _tiny_segmenter()
    H, W = 128, 192
    img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    live = seg.segment_array(img, stride=cfg.tile_size // 2)

    path = str(tmp_path / "tiny.pylcx")
    header = save_artifact(path, seg, H, W)
    model = ServingModel.load(path)
    served = model.segment(img)

    np.testing.assert_array_equal(live["class_map"], served["class_map"])
    np.testing.assert_array_equal(live["mask_rgb"], served["mask_rgb"])
    assert header["n_classes"] == cfg.n_classes
    assert model.meta["palette_rgb"] == [list(c) for c in cfg.palette_rgb]
    assert model.meta["class_labels"] == list(cfg.class_labels)


def test_artifact_includes_crf_program(rng, tmp_path):
    """A CRF-bearing program exports and reproduces the live result
    (xla CRF backend: platform-independent lowering)."""
    from pylc_tpu.ops.crf import make_crf
    cfg, seg = _tiny_segmenter(
        crf=make_crf(None, n_iters=2, downsample=1, backend="xla"))
    H, W = 128, 128
    img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    live = seg.segment_array(img, stride=cfg.tile_size // 2)

    path = str(tmp_path / "crf.pylcx")
    save_artifact(path, seg, H, W)
    served = ServingModel.load(path).segment(img)
    np.testing.assert_array_equal(live["class_map"], served["class_map"])


def test_artifact_rejects_wrong_geometry_and_magic(rng, tmp_path):
    cfg, seg = _tiny_segmenter()
    path = str(tmp_path / "tiny.pylcx")
    save_artifact(path, seg, 128, 192)
    model = ServingModel.load(path)
    with pytest.raises(ValueError, match="adjust_to_tile"):
        model.segment(rng.integers(0, 256, (64, 192, 3)).astype(np.uint8))
    with pytest.raises(ValueError, match="uint8"):
        model.segment(np.zeros((128, 192, 3), np.float32))

    bogus = tmp_path / "bogus.pylcx"
    bogus.write_bytes(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="not a PYLCX artifact"):
        ServingModel.load(str(bogus))


def test_export_refuses_mesh_segmenter(rng):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from pylc_tpu.export import export_segmenter
    from pylc_tpu.parallel.mesh import get_mesh
    cfg, seg = _tiny_segmenter()
    seg.mesh = get_mesh(2)
    with pytest.raises(ValueError, match="single-device"):
        export_segmenter(seg, 128, 192)


def test_cli_export_mode(rng, tmp_path, monkeypatch):
    """End-to-end: best-model checkpoint on disk -> `pylc export`
    -> artifact segments an image."""
    import json

    from flax import serialization
    cfg, seg = _tiny_segmenter()
    ckpt = str(tmp_path / "tiny.ckpt")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": seg.state.params,
             "batch_stats": seg.state.batch_stats}))
    # META_FIELDS carries arch but not the tiny-UNet shape knobs; the
    # meta file may hold any Config attrs, so spell them out
    meta = cfg.to_meta()
    meta.update(unet_depth=3, unet_wf=3, input_size=64, output_size=24,
                dropout=0.0, compute_dtype="float32")
    with open(ckpt + ".meta", "w") as f:
        json.dump(meta, f)
    out = str(tmp_path / "tiny.pylcx")

    from pylc_tpu import cli
    monkeypatch.setattr(
        cli, "_slow_backend_notice", lambda *a, **k: (lambda: None),
        raising=False)
    cli.main(["export", "-l", ckpt, "--size", "128x192", "-o", out])

    model = ServingModel.load(out)
    img = rng.integers(0, 256, (128, 192, 3)).astype(np.uint8)
    res = model.segment(img)
    assert res["class_map"].shape == (128, 192)
    assert res["mask_rgb"].shape == (128, 192, 3)
