"""Persistent XLA compilation cache.

A fresh DeepLab/ResNet101 compile costs 100-300 s against the tunneled
TPU backend and tens of seconds on CPU; every CLI invocation, bench run,
and test session pays it again.  JAX ships a persistent on-disk cache
(keyed on HLO + compile options + backend version) that turns repeat
compiles into millisecond cache reads — this module is the one switch
that turns it on for all PyLC-TPU entry points (CLI, bench, tests).

The reference has no analogue (torch eager pays no compile); this is
TPU-operational tooling, not a ported component.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Resolution order: explicit arg > $PYLC_COMPILATION_CACHE >
    ``~/.cache/pylc_tpu/xla``.  Set PYLC_COMPILATION_CACHE=off to
    disable.  Must run before the first jit compilation (backend may
    already be initialized).  Returns the cache dir, or None when
    disabled.

    TPU-backends only: XLA:CPU serializes AOT machine code whose target
    features can mismatch the loading host (the loader warns "could
    lead to execution errors such as SIGILL"), so on a CPU backend this
    is a measured no-op, not a safety call we leave to chance."""
    env = os.environ.get("PYLC_COMPILATION_CACHE")
    # The env kill-switch wins even over an explicit path argument —
    # otherwise a caller passing a default path would silently defeat it.
    if env is not None and env.strip().lower() in ("off", "none", ""):
        return None
    path = path or env or \
        os.path.join(os.path.expanduser("~"), ".cache", "pylc_tpu", "xla")
    if path.strip().lower() in ("off", "none", ""):
        return None
    import jax
    if jax.default_backend() == "cpu":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        # default gate is 1 s of compile time — keep everything slower
        # than that (the models here compile in minutes; toy test
        # programs below the gate aren't worth the disk round-trip).
        # Set the cache dir LAST so a failure here leaves the cache
        # fully off, matching the returned None.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", path)
    except (OSError, AttributeError) as e:  # unwritable dir / old jax
        import sys
        print(f"compilation cache disabled ({e})", file=sys.stderr)
        return None
    return path
