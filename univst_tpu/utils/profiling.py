"""Tracing / timing utilities (SURVEY.md §5: the reference has none; rebuild
adds jax.profiler traces + per-phase wall timers)."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-time per named phase; prints a one-line JSON report."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return json.dumps(
            {
                k: {"total_s": round(v, 3), "calls": self.counts[k]}
                for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
            }
        )


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope; view with xprof/tensorboard. No-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Force completion through the remote-TPU tunnel (block_until_ready can
    return early there; host transfer is the reliable barrier)."""
    import numpy as np
    import jax

    return jax.tree.map(np.asarray, tree)
