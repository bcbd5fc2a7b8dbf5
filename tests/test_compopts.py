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
