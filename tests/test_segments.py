"""Unit tests for host-side loop segmentation (pipelines/segments.py).

The phase split drops the dead content/style branches past the shift window
(reference keeps only the stylized epsilon chunk, stable_diffusion.py:712);
segment lengths must stay under the tunnel watchdog bound while covering the
window exactly when the bound allows it (e.g. chunk 13 -> 26 = 2x13 for the
SD window_end of 26, instead of rounding up to 30 with divisor-of-50 chunks).
"""

import pytest

from univst_tpu.pipelines.segments import exec_chunk, phase_segments


def _check(segments, start, end):
    """Segments tile [start, end) contiguously with uniform length."""
    pos = start
    lengths = {ln for _, ln in segments}
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


def test_phase_split_rounds_window_up(monkeypatch):
    """chunk 10, window_end=26 -> phase 1 covers 30 steps (gate False on the
    4 extra steps; correct, just not elided)."""
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "10")
    p1, p2 = phase_segments(50, 26)
    _check(p1, 0, 30)
    _check(p2, 30, 50)
    assert p1[0][1] == 10 and p2[0][1] == 10


@pytest.mark.parametrize("chunk", ["3", "7", "10", "13", "50", "64"])
@pytest.mark.parametrize("n,window_end", [(50, 26), (50, 31), (10, 4), (6, 4)])
def test_phase_split_tiles(monkeypatch, chunk, n, window_end):
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", chunk)
    p1, p2 = phase_segments(n, window_end)
    k1 = p1[-1][0] + p1[-1][1]
    _check(p1, 0, k1)
    assert k1 >= min(window_end, n)
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
