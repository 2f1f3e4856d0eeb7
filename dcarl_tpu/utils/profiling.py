"""Profiling hooks — the TPU equivalent of the reference's tracing.

The reference records TF1 ``FULL_TRACE`` run metadata every 100 train
steps into TensorBoard (SW/tools/DCARL/stable_baselines/deepq/
dqn.py:273-286).  Here: ``jax.profiler`` traces (viewable in
TensorBoard / Perfetto) plus lightweight wall-clock timers for host
code.  Everything degrades to a no-op when profiling is off, so hooks
can stay in production loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str], create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block; no-op when
    ``log_dir`` is None (the every-N-steps gating knob)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceMe timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side wall-clock accumulator for coarse step breakdowns
    (compile vs steady-state, env vs learn)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_s": v / self.counts[k]}
                for k, v in self.totals.items()}
