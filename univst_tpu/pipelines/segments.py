"""Host-side segmentation of the denoise loops.

Two concerns meet here:
  * the remote-TPU tunnel enforces a ~2 minute per-execution watchdog, so the
    50-step scans run as host-driven segments sharing compiled graphs
    (UNIVST_EXEC_CHUNK, default 10 steps per dispatch);
  * past the AdaIN shift window the content/style branches of the stylization
    batch are dead compute (StyleShiftConfig.window_end — the reference keeps
    only the stylized epsilon chunk, stable_diffusion.py:712), so the loop is
    split into a multi-branch phase 1 and a stylized-only phase 2.
"""

from __future__ import annotations

import os

import jax


def _raw_chunk(num_steps: int, default: int = 13) -> int:
    """UNIVST_EXEC_CHUNK as given (not divisor-constrained); the full loop on
    CPU unless the env var is set explicitly (tests force segmentation).

    ``default`` is the per-pipeline bound when the env var is unset: the
    tunnel watchdog allows ~2 min per execution, so SD/AD 512px steps can
    batch 13-26 per dispatch while SD3 at 1024px (~8 s/step) must stay small.
    """
    raw = os.environ.get("UNIVST_EXEC_CHUNK")
    if raw is not None and int(raw) < 1:
        raise ValueError(
            f"UNIVST_EXEC_CHUNK={raw!r} must be a positive step count"
        )
    if raw is None and jax.default_backend() not in ("tpu", "axon"):
        return num_steps
    return min(int(raw) if raw else default, num_steps)


def exec_chunk(num_steps: int, default: int = 13) -> int:
    """Largest divisor of num_steps <= UNIVST_EXEC_CHUNK on TPU; the full loop
    elsewhere unless the env var is set explicitly (tests force segmentation
    on CPU)."""
    chunk = _raw_chunk(num_steps, default)
    return max(d for d in range(1, chunk + 1) if num_steps % d == 0)


def phase_segments(n: int, window_end: int, default: int = 13):
    """Split the n-step loop at the shift window for the dead-branch cut.

    Returns (phase1_segments, phase2_segments): lists of (start, length).
    Phase 1 (multi-branch) covers EXACTLY [0, window_end): full chunks plus
    one shorter remainder segment when the chunk does not divide the window
    (the remainder is a second compiled graph for phase 1, but one wasted
    multi-branch step costs ~2x a stylized-only step every run — e.g. the
    SD3 window of 31 under chunk 4 used to round up to 32 capture+inject
    steps). Phase 2 runs the stylized-only batch with the largest divisor
    chunk of its own length. Both respect the exec-chunk watchdog bound.
    window_end >= n disables the split.
    """
    if window_end >= n or os.environ.get("UNIVST_DISABLE_PHASE_SPLIT"):
        c = exec_chunk(n, default)
        return [(s0, c) for s0 in range(0, n, c)], []
    c = _raw_chunk(n, default)
    k1 = max(0, min(n, window_end))
    segs1 = [(s0, c) for s0 in range(0, k1 - k1 % c, c)]
    if k1 % c:
        segs1.append((k1 - k1 % c, k1 % c))
    k2 = n - k1
    c2 = max(d for d in range(1, min(c, k2) + 1) if k2 % d == 0)
    return segs1, [(s0, c2) for s0 in range(k1, n, c2)]
