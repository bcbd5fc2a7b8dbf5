"""Persistent-compilation-cache switch.

CPU backends are a no-op by DEFAULT (XLA:CPU's AOT loader warns
serialized machine code may mismatch a different host — "could lead to
SIGILL") but opt in via ``allow_cpu=True`` under a per-host-fingerprint
subdirectory, which is how the test suite itself runs (conftest.py,
VERDICT r4 item 6).  The TPU-positive path is validated on the real
chip (docs/PERF_ROUND3.md: 46 entries written, fresh-process reload in
seconds)."""

import os

from pylc_tpu.utils.compcache import (_host_fingerprint,
                                      enable_compilation_cache)


def test_noop_on_cpu_backend_by_default(monkeypatch):
    # conftest pins the cpu backend for the whole suite
    monkeypatch.delenv("PYLC_COMPILATION_CACHE", raising=False)
    assert enable_compilation_cache("/tmp/should_not_be_used") is None


def test_off_switch(monkeypatch):
    monkeypatch.setenv("PYLC_COMPILATION_CACHE", "off")
    assert enable_compilation_cache() is None
    # the kill-switch must also beat an explicit CPU opt-in
    assert enable_compilation_cache("/tmp/x", allow_cpu=True) is None


def test_cpu_opt_in_uses_host_fingerprint(tmp_path, monkeypatch):
    import jax

    monkeypatch.delenv("PYLC_COMPILATION_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = enable_compilation_cache(str(tmp_path), allow_cpu=True)
        assert got == os.path.join(str(tmp_path),
                                   "cpu-" + _host_fingerprint())
        assert os.path.isdir(got)
    finally:
        # don't leave the suite-wide cache (conftest) pointed at tmp
        jax.config.update("jax_compilation_cache_dir", prev)


def test_host_fingerprint_is_stable():
    a, b = _host_fingerprint(), _host_fingerprint()
    assert a == b and len(a) == 16 and all(c in "0123456789abcdef"
                                           for c in a)
