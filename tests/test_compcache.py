"""Persistent-compilation-cache switch: CPU backends must be a no-op
(XLA:CPU's AOT loader warns serialized machine code may mismatch the
host — "could lead to SIGILL"), and the explicit off-switch must win.
The TPU-positive path is validated on the real chip (docs/
PERF_ROUND3.md: 46 entries written, fresh-process reload in seconds)."""

from pylc_tpu.utils.compcache import enable_compilation_cache


def test_noop_on_cpu_backend():
    # conftest pins the cpu backend for the whole suite
    assert enable_compilation_cache("/tmp/should_not_be_used") is None


def test_off_switch(monkeypatch):
    monkeypatch.setenv("PYLC_COMPILATION_CACHE", "off")
    assert enable_compilation_cache() is None
