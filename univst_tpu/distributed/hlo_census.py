"""Collective-op census over SPMD-partitioned HLO text.

Single shared parser for `scripts/comm_census.py` (the per-family byte
tables in BENCH_NOTES) and `tests/test_comm_pattern.py` (the regression
assertions) — the two must agree on what counts as a collective and how its
payload bytes are summed, so the logic lives here once.
"""

from __future__ import annotations

import re

COLLECTIVE_OPS = (
    "all-gather",
    "collective-permute",
    "all-reduce",
    "all-to-all",
    "reduce-scatter",
)

_HEAD_RE = re.compile(
    r"= (.*?)\b(" + "|".join(COLLECTIVE_OPS) + r")(?:-start)?\("
)
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1, "f8e3m4": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "c128": 16,
}
_SHAPE_RE = re.compile(
    r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]"
)


def collect_collectives(hlo_text: str) -> list:
    """Return ``[(op_name, payload_bytes, hlo_line), ...]`` for every
    collective in ``hlo_text``. Tuple result types (combined all-to-alls)
    put several dtype[dims] groups before the op name; all are summed."""
    out = []
    for line in hlo_text.splitlines():
        m = _HEAD_RE.search(line)
        if not m:
            continue
        sz = 0
        for dt, dims in _SHAPE_RE.findall(m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:  # scalar shapes print as dtype[]
                    n *= int(d)
            sz += n * _DTYPE_BYTES[dt]
        out.append((m.group(2), sz, line.strip()))
    return out
