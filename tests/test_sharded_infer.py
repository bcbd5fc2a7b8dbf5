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


def test_mesh_segment_stream_matches_single_device(rng):
    """segment_stream is the CLI tester's iteration path (one-image
    device lookahead); on a mesh every streamed class map must equal
    the single-device result, including across a mid-stream canvas
    shape change (new compiled program per shape)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    imgs = [("a", rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)),
            ("b", rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)),
            ("c", rng.integers(0, 256, (128, 192, 3)).astype(np.uint8))]

    single = Segmenter(cfg, state, predict, batch_size=2)
    want = {tag: single.segment_array(im, stride=32)["class_map"]
            for tag, im in imgs}

    sharded = Segmenter(cfg, state, predict, batch_size=1,
                        mesh=get_mesh(8))
    got = dict((tag, res["class_map"]) for tag, res in
               sharded.segment_stream(iter(imgs), stride=32))
    assert list(got) == ["a", "b", "c"]
    for tag in want:
        np.testing.assert_array_equal(want[tag], got[tag])


def test_mesh_segment_many_matches_single_device(rng):
    """segment_many is the pipelined batch path (bench --mode
    pipeline); on a mesh every photo's class map must equal the
    single-device result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    imgs = [rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)
            for _ in range(3)]

    single = Segmenter(cfg, state, predict, batch_size=2)
    want = [single.segment_array(im, stride=32)["class_map"]
            for im in imgs]

    sharded = Segmenter(cfg, state, predict, batch_size=1,
                        mesh=get_mesh(8))
    got = sharded.segment_many(imgs, stride=32)
    assert len(got) == 3
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g["class_map"])


def test_mesh_segmenter_engages_banded_program(rng, monkeypatch):
    """A mesh Segmenter must route through the fully-banded program
    (per-device H2D row bands + shard_map unfold/forward/halo-stitch;
    round 4, VERDICT r3 item 6), not fall back to the replicated
    unfold."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import pylc_tpu.parallel.banded_infer as BI

    calls = []
    real = BI.run_banded

    def spy(state, bands, forward_probs, n_cols, *args, **kw):
        calls.append((bands.shape, n_cols))
        return real(state, bands, forward_probs, n_cols, *args, **kw)

    monkeypatch.setattr(BI, "run_banded", spy)

    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    img = rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)

    seg = Segmenter(cfg, state, predict, batch_size=1, mesh=get_mesh(8))
    res = seg.segment_array(img, stride=32)
    # 4 grid rows pad to 8 shards of 1 tile row; bands are 64 rows each
    assert calls == [((8, 64, 224, 3), 6)], \
        "banded mesh program was not engaged"
    assert res["class_map"].shape == (160, 224)


def test_band_split_and_guide_roundtrip(rng):
    """split_bands -> banded_guide must reproduce the original image
    exactly (including grid-padded band tails), and each band must hold
    its tile rows plus the halo."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp
    from pylc_tpu.parallel import banded_infer as BI

    tile, stride = 64, 32
    for H, W in ((160, 224), (288, 128)):
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        plan = BI.plan_bands(H, W, tile, stride, 8)
        bands = BI.split_bands(img, plan)
        assert bands.shape == (8, plan.band_h, W, 3)
        # every band's real rows match the image slice it claims
        for d in range(8):
            top = d * plan.nL * stride
            rows = min(max(H - top, 0), plan.band_h)
            if rows:
                np.testing.assert_array_equal(
                    bands[d, :rows], img[top:top + rows])
            assert (bands[d, rows:] == 0).all()
        guide = np.asarray(BI.banded_guide(jnp.asarray(bands), plan))
        np.testing.assert_array_equal(guide, img)


def test_segmenter_cache_is_bounded(rng):
    """The compiled-program cache must evict LRU entries past
    cache_size so segment_stream over heterogeneous archives doesn't
    retain every canvas program forever."""
    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    seg = Segmenter(cfg, state, predict, batch_size=4, cache_size=2)

    shapes = [(128, 128), (128, 192), (192, 128)]
    for H, W in shapes:
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        seg.segment_array(img, stride=64)
    assert len(seg._cache) == 2
    assert (128, 128, 64) not in seg._cache  # least-recent evicted
    assert (192, 128, 64) in seg._cache

    # re-running an evicted shape recompiles and evicts the next LRU
    img = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    seg.segment_array(img, stride=64)
    assert (128, 128, 64) in seg._cache
    assert (128, 192, 64) not in seg._cache


def test_segment_many_rejects_mixed_shapes(rng):
    """segment_many compiles for imgs[0]'s canvas; a mixed-shape list
    must raise instead of returning wrong-shaped garbage."""
    import pytest
    from pylc_tpu.infer import Segmenter
    from collections import OrderedDict
    seg = Segmenter.__new__(Segmenter)  # no model needed before the check
    seg.cfg = __import__("pylc_tpu.config", fromlist=["Config"]).Config()
    seg._cache = OrderedDict()
    seg.cache_size = Segmenter.CACHE_SIZE
    seg.state = None  # the stubbed run ignores it
    a = rng.integers(0, 255, (128, 192, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (192, 128, 3)).astype(np.uint8)
    seg._cache[(128, 192, 256)] = (lambda *args: (None, None), None)
    with pytest.raises(ValueError, match="uniform shapes"):
        seg.segment_many([a, b])


@pytest.mark.slow
def test_mesh_crf_runs_pallas_kernel_under_shard_map(rng):
    """mesh + --crf: GSPMD cannot partition the Pallas CRF kernel over
    the 'data'-sharded canvas, so Segmenter._build reroutes through
    parallel/sharded_crf.py — the kernel runs per row band under
    shard_map with halo exchange — and the result must match the
    single-device run exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pylc_tpu.ops.crf import make_crf
    from pylc_tpu.parallel import sharded_crf as sc

    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    img = rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)

    # force the pallas backend as a real TPU 'auto' run would select
    crf_pallas = make_crf(n_iters=2, downsample=1, backend="pallas")
    assert crf_pallas.params.backend == "pallas"

    calls = []
    real = sc.mean_field_sharded

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    # the Segmenter imports the symbol at trace time from the module
    sc.mean_field_sharded = spy
    try:
        sharded = Segmenter(cfg, state, predict, batch_size=1,
                            mesh=get_mesh(8), crf=crf_pallas)
        res8 = sharded.segment_array(img, stride=32)
    finally:
        sc.mean_field_sharded = real
    assert calls, "mesh program did not engage the sharded pallas CRF"

    single = Segmenter(cfg, state, predict, batch_size=2,
                       crf=make_crf(n_iters=2, downsample=1,
                                    backend="pallas"))
    res1 = single.segment_array(img, stride=32)
    np.testing.assert_array_equal(res1["class_map"], res8["class_map"])


@pytest.mark.slow
def test_mesh_crf_unshardable_geometry_falls_back_to_xla(rng):
    """When a band cannot hold the message radius (can_shard_crf
    False), the mesh program must fall back to the XLA shifted-add
    form and never trace the pallas kernel."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pylc_tpu.ops.crf import make_crf

    tile = 64
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=24,
                           unet_depth=3, unet_wf=3, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    img = rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)

    # downsample 8: grid 20 rows -> 3-row bands < radius 4
    crf_pallas = make_crf(n_iters=2, downsample=8, radius=4,
                          backend="pallas")
    from pylc_tpu.parallel.sharded_crf import can_shard_crf
    assert not can_shard_crf(160, crf_pallas.params, 8)

    import pylc_tpu.ops.pallas.crf_kernel as ck
    pallas_calls = []
    real_iter = ck.crf_iteration

    def spy(*a, **kw):
        pallas_calls.append(1)
        return real_iter(*a, **kw)

    ck.crf_iteration = spy
    try:
        sharded = Segmenter(cfg, state, predict, batch_size=1,
                            mesh=get_mesh(8), crf=crf_pallas)
        res8 = sharded.segment_array(img, stride=32)
    finally:
        ck.crf_iteration = real_iter
    assert not pallas_calls, "mesh program traced the pallas CRF kernel"

    single = Segmenter(cfg, state, predict, batch_size=2,
                       crf=make_crf(n_iters=2, downsample=8, radius=4,
                                    backend="xla"))
    res1 = single.segment_array(img, stride=32)
    np.testing.assert_array_equal(res1["class_map"], res8["class_map"])


def test_sharded_crf_matches_single_device_kernel(rng):
    """mean_field_sharded == mean_field(pallas) bit-for-bit: halo
    exchange + per-iteration re-pinning of the global pad rows
    reproduce the unsharded kernel's replicated-edge semantics,
    including uneven band splits (H=100 over 8 devices)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp
    from pylc_tpu.ops.crf import CRFParams, mean_field
    from pylc_tpu.parallel.sharded_crf import (can_shard_crf,
                                               mean_field_sharded)

    H, W, C = 100, 140, 5
    probs = rng.dirichlet(np.ones(C), size=(H, W)).astype(np.float32)
    guide = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    mesh = get_mesh(8)
    for ds in (1, 2):
        p = CRFParams(n_iters=5, radius=3, downsample=ds,
                      backend="pallas")
        assert can_shard_crf(H, p, 8)
        ref = np.asarray(mean_field(jnp.asarray(probs),
                                    jnp.asarray(guide), p))
        got = np.asarray(mean_field_sharded(
            jnp.asarray(probs), jnp.asarray(guide), p, mesh))
        np.testing.assert_array_equal(ref, got)

    # grayscale pipelines (ch=1) feed an [H, W, 1] guide
    g1 = guide[..., :1]
    p = CRFParams(n_iters=3, radius=3, downsample=2, backend="pallas")
    ref = np.asarray(mean_field(jnp.asarray(probs), jnp.asarray(g1), p))
    got = np.asarray(mean_field_sharded(
        jnp.asarray(probs), jnp.asarray(g1), p, mesh))
    np.testing.assert_array_equal(ref, got)


def test_sharded_crf_other_mesh_size(rng):
    """4-device mesh with an uneven band split (Hk=27 -> bands of 7,
    pad 1): the band/pad arithmetic must hold below the full mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import jax.numpy as jnp
    from pylc_tpu.ops.crf import CRFParams, mean_field
    from pylc_tpu.parallel.sharded_crf import (can_shard_crf,
                                               mean_field_sharded)

    H, W, C = 54, 96, 4
    probs = rng.dirichlet(np.ones(C), size=(H, W)).astype(np.float32)
    guide = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
    p = CRFParams(n_iters=2, radius=3, downsample=2, backend="pallas")
    assert can_shard_crf(H, p, 4)
    ref = np.asarray(mean_field(jnp.asarray(probs), jnp.asarray(guide), p))
    got = np.asarray(mean_field_sharded(
        jnp.asarray(probs), jnp.asarray(guide), p, get_mesh(4)))
    np.testing.assert_array_equal(ref, got)


def test_can_shard_crf_rejects_pad_spanning_bands():
    """9 grid rows over 8 devices gives uniform bands of 2 with 7 pad
    rows — pad spills past the last band, where the per-iteration edge
    re-pinning can't correct it, so the geometry must be rejected even
    though each band holds >= radius rows."""
    from pylc_tpu.ops.crf import CRFParams
    from pylc_tpu.parallel.sharded_crf import can_shard_crf

    p = CRFParams(n_iters=1, radius=2, downsample=1, backend="pallas")
    assert not can_shard_crf(9, p, 8)      # h_loc=2 >= r, but pad=7 >= 2
    assert can_shard_crf(16, p, 8)         # exact split
    assert can_shard_crf(15, p, 8)         # pad=1 < h_loc=2
    assert not can_shard_crf(8, p, 8)      # h_loc=1 < radius
