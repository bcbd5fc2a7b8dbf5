"""Multi-chip (virtual mesh) inference: sharded tile batch must produce
the identical mask to single-device inference."""

import jax
import numpy as np
import pytest

from pylc_tpu.config import Config
from pylc_tpu.infer import Segmenter
from pylc_tpu.parallel.mesh import get_mesh
from pylc_tpu.train_state import init_state, make_predict
from pylc_tpu.models.registry import build_model


@pytest.mark.slow
def test_sharded_inference_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    model_eval = build_model(cfg, train=False)
    predict = make_predict(cfg, model_eval)

    H, W = 160, 224  # 4 x 6 grid at stride 32
    img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)

    single = Segmenter(cfg, state, predict, batch_size=2)
    res1 = single.segment_array(img, stride=32)

    mesh = get_mesh(8)
    sharded = Segmenter(cfg, state, predict, batch_size=1, mesh=mesh)
    res8 = sharded.segment_array(img, stride=32)

    np.testing.assert_array_equal(res1["class_map"], res8["class_map"])
    np.testing.assert_array_equal(res1["mask_rgb"], res8["mask_rgb"])


def test_segment_many_rejects_mixed_shapes(rng):
    """segment_many compiles for imgs[0]'s canvas; a mixed-shape list
    must raise instead of returning wrong-shaped garbage."""
    import pytest
    from pylc_tpu.infer import Segmenter
    seg = Segmenter.__new__(Segmenter)  # no model needed before the check
    seg.cfg = __import__("pylc_tpu.config", fromlist=["Config"]).Config()
    seg._cache = {}
    seg.state = None  # the stubbed run ignores it
    a = rng.integers(0, 255, (128, 192, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (192, 128, 3)).astype(np.uint8)
    seg._cache[(128, 192, 256)] = lambda *args: (None, None)
    with pytest.raises(ValueError, match="uniform shapes"):
        seg.segment_many([a, b])
