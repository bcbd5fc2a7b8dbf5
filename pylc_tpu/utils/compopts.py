"""Measured-win PJRT compiler options for the hot jits.

On the tunneled axon backend, env ``XLA_FLAGS`` never reach the TPU
compiler (compilation happens in a remote ``tpu_compile_helper``; every
``--xla_tpu_*`` env flag dies locally as "Unknown flag"— see
``scripts/xla_flag_sweep.py``).  The channel that DOES reach it is
PJRT ``compiler_options`` (``jax.jit(..., compiler_options=...)``),
which rides the compile RPC and is validated server-side.

``scripts/compiler_options_sweep.py`` swept the documented TPU
scheduler/fusion/VMEM options over the batch-8 DeepLab/ResNet101 train
step (docs/PERF_ROUND4.md).  One option won reproducibly across three
independent compiles: ``xla_tpu_async_copy_bandwidth_scaling_factor=2.0``
at 45.4-45.6 ms/step vs 46.2-47.6 for every no-options measurement
(~1.5% after discounting the warm-up ordering artifact the sweep
controlled for).  It is a scheduler cost-model hint (async copies
modeled 2x faster, shifting latency-hiding decisions) — numerically
output-identical by construction.

The reference has no analogue (torch eager has no compile pipeline);
this is TPU-operational tooling, not a ported component.
"""

from __future__ import annotations

import os

# Reproducible winner from the round-4 sweep (docs/PERF_ROUND4.md).
DEFAULT_TPU_OPTIONS = {
    "xla_tpu_async_copy_bandwidth_scaling_factor": "2.0",
}


def tpu_compiler_options() -> dict[str, str] | None:
    """Compiler options for the hot jits, or None for compiler defaults.

    Resolution: ``$PYLC_COMPILER_OPTIONS`` set to ``off``/``none``/empty
    disables; set to ``k=v,k2=v2`` overrides the defaults wholesale;
    unset applies :data:`DEFAULT_TPU_OPTIONS` when the default backend
    is TPU-like (``tpu``/``axon``) and None elsewhere (the CPU/GPU
    compilers reject unknown ``xla_tpu_*`` options)."""
    env = os.environ.get("PYLC_COMPILER_OPTIONS")
    if env is not None:
        env = env.strip()
        if env.lower() in ("off", "none", ""):
            return None
        opts = {}
        for pair in env.split(","):
            k, _, v = pair.partition("=")
            if not k.strip() or not _:
                raise ValueError(
                    f"PYLC_COMPILER_OPTIONS: expected k=v[,k=v...], got "
                    f"{env!r}")
            opts[k.strip()] = v.strip()
        return opts
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        return dict(DEFAULT_TPU_OPTIONS)
    return None
