"""Unit tests for the shared HLO collective parser (distributed/hlo_census).

The parser backs both the comm-pattern regression assertions and the
BENCH_NOTES census tables; round 3's tuple-result fix (a combined all-to-all
over q/k/v emits ``= (f32[...], f32[...], ...) all-to-all(...)``) silently
changed what older assertions saw, so the parsing semantics are pinned here.
"""

from univst_tpu.distributed.hlo_census import collect_collectives

_HLO = """\
HloModule jit_fn
  %p = f32[8,16]{1,0} parameter(0)
  %ag = f32[64,16]{1,0} all-gather(%p), replica_groups={{0,1,2,3,4,5,6,7}}
  %cp = bf16[8,16]{1,0} collective-permute(%c), source_target_pairs={{0,1}}
  %a2a = (f32[1,4,16]{2,1,0}, f32[1,4,16]{2,1,0}, bf16[1,4,16]{2,1,0}) all-to-all(%x, %y, %z), replica_groups=[2,4]<=[8]
  %ars = f32[8,16]{1,0} all-reduce-start(%p), to_apply=%sum
  %prm = pred[8,16]{1,0} all-reduce(%m), to_apply=%or
  %add = f32[8,16]{1,0} add(%p, %p)
  %note = f32[8]{0} custom-call(), custom_call_target="not-an-all-gather-op"
"""


def test_collects_ops_and_bytes():
    colls = collect_collectives(_HLO)
    ops = [c[0] for c in colls]
    assert ops == ["all-gather", "collective-permute", "all-to-all",
                   "all-reduce", "all-reduce"]
    sizes = {(c[0], c[1]) for c in colls}
    assert ("all-gather", 64 * 16 * 4) in sizes
    assert ("collective-permute", 8 * 16 * 2) in sizes
    # tuple result: every dtype[dims] group in the head is summed
    assert ("all-to-all", 64 * 4 + 64 * 4 + 64 * 2) in sizes
    # -start suffix (async collectives) maps to the base op
    assert ("all-reduce", 8 * 16 * 4) in sizes
    # pred is 1 byte in HLO, not 4
    assert ("all-reduce", 8 * 16 * 1) in sizes


def test_each_entry_keeps_its_hlo_line():
    colls = collect_collectives(_HLO)
    assert all(op in line for op, _, line in colls)
