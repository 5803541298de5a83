"""Unit tests for host-side loop segmentation (pipelines/segments.py).

The phase split drops the dead content/style branches past the shift window
(reference keeps only the stylized epsilon chunk, stable_diffusion.py:712);
segment lengths must stay under the tunnel watchdog bound while covering the
window exactly when the bound allows it (e.g. chunk 13 -> 26 = 2x13 for the
SD window_end of 26, instead of rounding up to 30 with divisor-of-50 chunks).
"""

import pytest

from univst_tpu.pipelines.segments import exec_chunk, phase_segments


def _check(segments, start, end, allow_remainder=False):
    """Segments tile [start, end) contiguously with uniform length (phase 1
    may end with one shorter remainder segment that pins the phase boundary
    to the shift window exactly)."""
    pos = start
    lengths = {ln for _, ln in segments}
    if allow_remainder and len(segments) > 1:
        body = {ln for _, ln in segments[:-1]}
        assert len(body) == 1, f"non-uniform body lengths {body}"
        assert segments[-1][1] <= next(iter(body))
    else:
        assert len(lengths) <= 1, f"non-uniform lengths {lengths}"
    for s0, ln in segments:
        assert s0 == pos and ln >= 1
        pos += ln
    assert pos == end


def test_exec_chunk_divides(monkeypatch):
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "13")
    assert exec_chunk(50) == 10  # largest divisor of 50 <= 13
    assert exec_chunk(12) == 12
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "7")
    assert exec_chunk(50) == 5


def test_phase_split_exact_window(monkeypatch):
    """chunk 13, n=50, window_end=26: phase 1 = 2x13 exactly on the window,
    phase 2 = 24 as 2x12 (largest divisor <= 13)."""
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "13")
    p1, p2 = phase_segments(50, 26)
    assert p1 == [(0, 13), (13, 13)]
    assert p2 == [(26, 12), (38, 12)]


def test_phase_split_remainder_pins_window(monkeypatch):
    """chunk 10, window_end=26 -> phase 1 is 10+10+6 (remainder segment ends
    exactly on the window — no wasted ~2x multi-branch steps), phase 2 tiles
    the remaining 24 with its largest divisor chunk <= 10."""
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "10")
    p1, p2 = phase_segments(50, 26)
    assert p1 == [(0, 10), (10, 10), (20, 6)]
    _check(p2, 26, 50)
    assert p2[0][1] == 8


def test_phase_split_sd3_window(monkeypatch):
    """The SD3 window (31 steps, inclusive eta2*50=30) under the pipeline's
    chunk 4: 7 full segments + a 3-step remainder — previously this rounded
    up to 32 capture+inject steps, wasting one ~2x-cost step per run."""
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "4")
    p1, p2 = phase_segments(50, 31)
    assert p1[-1] == (28, 3)
    assert sum(c for _, c in p1) == 31
    _check(p1, 0, 31, allow_remainder=True)
    _check(p2, 31, 50)


@pytest.mark.parametrize("chunk", ["3", "7", "10", "13", "50", "64"])
@pytest.mark.parametrize("n,window_end", [(50, 26), (50, 31), (10, 4), (6, 4)])
def test_phase_split_tiles(monkeypatch, chunk, n, window_end):
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", chunk)
    p1, p2 = phase_segments(n, window_end)
    k1 = p1[-1][0] + p1[-1][1]
    _check(p1, 0, k1, allow_remainder=True)
    assert k1 == min(window_end, n) or k1 == n
    if p2:
        _check(p2, k1, n)
    else:
        assert k1 == n
    # watchdog bound: no segment longer than the requested chunk
    bound = int(chunk)
    for s0, ln in p1 + p2:
        assert ln <= bound


def test_phase_split_disabled(monkeypatch):
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "13")
    monkeypatch.setenv("UNIVST_DISABLE_PHASE_SPLIT", "1")
    p1, p2 = phase_segments(50, 26)
    assert p2 == []
    _check(p1, 0, 50)
    assert p1[0][1] == 10  # divisor rule for the single-phase loop


def test_window_covers_loop(monkeypatch):
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "13")
    p1, p2 = phase_segments(50, 50)
    assert p2 == []
    _check(p1, 0, 50)
