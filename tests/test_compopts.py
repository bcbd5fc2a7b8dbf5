"""tpu_compiler_options resolution: env kill-switch, override parsing,
CPU gating, and that the wired jit sites still compile under it."""

import pytest

from pylc_tpu.utils.compopts import DEFAULT_TPU_OPTIONS, tpu_compiler_options


def test_cpu_backend_gets_none(monkeypatch):
    # conftest forces JAX_PLATFORMS=cpu for the test session
    monkeypatch.delenv("PYLC_COMPILER_OPTIONS", raising=False)
    assert tpu_compiler_options() is None


@pytest.mark.parametrize("val", ["off", "OFF", " none ", ""])
def test_env_kill_switch(monkeypatch, val):
    monkeypatch.setenv("PYLC_COMPILER_OPTIONS", val)
    assert tpu_compiler_options() is None


def test_env_override_parses_pairs(monkeypatch):
    monkeypatch.setenv("PYLC_COMPILER_OPTIONS",
                       "xla_foo=1 , xla_bar = true")
    assert tpu_compiler_options() == {"xla_foo": "1", "xla_bar": "true"}


@pytest.mark.parametrize("bad", ["xla_foo", "=1", "a=1,,b=2"])
def test_env_malformed_raises(monkeypatch, bad):
    monkeypatch.setenv("PYLC_COMPILER_OPTIONS", bad)
    with pytest.raises(ValueError):
        tpu_compiler_options()


def test_defaults_are_stringly_typed():
    # PJRT env_option_overrides want string values; a stray bool/float
    # would fail server-side on the remote compiler only
    assert DEFAULT_TPU_OPTIONS
    for k, v in DEFAULT_TPU_OPTIONS.items():
        assert isinstance(k, str) and isinstance(v, str)


def test_canvas_program_traces_with_options_enabled(monkeypatch):
    """Regression (round-4 TPU bench crash): options must sit on the
    TOP-LEVEL canvas jit only.  make_predict's jit runs nested inside
    it, and JAX raises `compiler_options can only be passed to
    top-level jax.jit` at TRACE time if any nested jit carries options
    — so lowering (no backend compile) catches the wiring bug on CPU
    with the TPU options forced on."""
    import jax
    import numpy as np
    from pylc_tpu.config import Config
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.train_state import init_state, make_predict

    monkeypatch.setenv("PYLC_COMPILER_OPTIONS",
                       "xla_tpu_async_copy_bandwidth_scaling_factor=2.0")
    tile = 32
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=16, unet_depth=2,
                           unet_wf=2, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    seg = Segmenter(cfg, state, predict, batch_size=2)
    run, plan = seg._program(64, 96, tile // 2)
    assert plan is None
    img = np.zeros((64, 96, 3), np.uint8)
    run.lower(state, img)  # traces; raises if options are nested
    # the mesh variants must hold the same invariant: tracing them
    # (segment_array compiles on the CPU mesh, where options resolve
    # through the same monkeypatched env) must not hit the nested check
    if len(jax.devices()) >= 2:
        from pylc_tpu.parallel.mesh import get_mesh
        seg_m = Segmenter(cfg, state, predict, batch_size=1,
                          mesh=get_mesh(2))
        run_m, plan_m = seg_m._program(64, 96, tile // 2)
        run_m.lower(state, seg_m._put_input(img, plan_m))


def test_export_unwraps_options_bearing_program(monkeypatch, tmp_path):
    """export wraps the canvas program in its own top-level jit; with
    options enabled the inner jit must be unwrapped or export raises."""
    import jax
    from pylc_tpu.config import Config
    from pylc_tpu.export import export_segmenter
    from pylc_tpu.infer import Segmenter
    from pylc_tpu.models.registry import build_model
    from pylc_tpu.train_state import init_state, make_predict

    monkeypatch.setenv("PYLC_COMPILER_OPTIONS",
                       "xla_tpu_async_copy_bandwidth_scaling_factor=2.0")
    tile = 32
    cfg = Config().replace(arch="unet", ch=3, tile_size=tile,
                           input_size=tile, output_size=16, unet_depth=2,
                           unet_wf=2, dropout=0.0,
                           compute_dtype="float32")
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    predict = make_predict(cfg, build_model(cfg, train=False))
    seg = Segmenter(cfg, state, predict, batch_size=2)
    # export compiles for THIS host (CPU): the TPU-only option must not
    # be forwarded to the exported module's compile either
    exported = export_segmenter(seg, 64, 96)
    assert exported.in_avals[0].shape == (64, 96, 3)


def test_wired_jits_compile_on_cpu(monkeypatch):
    """The jit sites pass compiler_options=None on CPU and still run."""
    import jax
    import numpy as np
    from pylc_tpu.config import Config
    from pylc_tpu.train_state import (init_state, make_step_key,
                                      make_train_step)
    monkeypatch.delenv("PYLC_COMPILER_OPTIONS", raising=False)
    cfg = Config().replace(arch="unet", ch=3, tile_size=32, input_size=32,
                           output_size=16, unet_depth=2, unet_wf=2,
                           norm_type="batch", dropout=0.0, batch_size=2)
    state, model = init_state(cfg, jax.random.PRNGKey(0), 10)
    step = make_train_step(cfg, model)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    mask = rng.integers(0, cfg.n_classes, (2, 32, 32)).astype(np.uint8)
    state, m = step(state, img, mask, make_step_key(0, cfg.rng_impl))
    assert np.isfinite(float(m["total"]))
