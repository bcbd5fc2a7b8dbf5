"""Runtime tracing & stage timing.

The reference has no performance tracing at all — "profiling" there
means dataset statistics (SURVEY.md §5.1).  This module adds:

  - ``trace(dir)``: context manager around ``jax.profiler`` traces
    (viewable in TensorBoard / Perfetto), used by ``bench.py --trace``;
  - ``StageTimer``: lightweight named stage timing with device sync at
    stage boundaries, producing the per-stage breakdown behind the
    MP/s metric (decode / H2D / forward / stitch / CRF / D2H);
  - ``annotate``: TraceAnnotation wrapper so named regions show up in
    device profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str, python_tracer: bool = False):
    """Capture a device trace into ``log_dir``.

    The Python host tracer is OFF by default: host-side frame events
    flood the chrome-trace export's 1M-event cap long before the device
    ops of interest are reached (a traced 20-step train run otherwise
    captures only init-time modules), and the device timeline is what
    bench analysis consumes."""
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 1 if python_tracer else 0
        jax.profiler.start_trace(log_dir, profiler_options=opts)
    except TypeError:  # older jax without profiler_options
        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device profiles."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage timer; ``sync=True`` blocks on device work so a
    stage's time is attributable to it."""

    def __init__(self):
        self.stages: List[Tuple[str, float]] = []
        self._t: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.stages.append((name, time.perf_counter() - t0))

    def total(self) -> float:
        return sum(t for _, t in self.stages)

    def report(self) -> str:
        total = self.total() or 1e-9
        lines = [f"{'stage':20s}{'seconds':>10s}{'share':>8s}"]
        for name, t in self.stages:
            lines.append(f"{name:20s}{t:>10.4f}{t / total:>7.1%}")
        lines.append(f"{'total':20s}{total:>10.4f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)
