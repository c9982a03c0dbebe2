"""Unit tests for the HLO collective parser behind scripts/collective_budget.py.

The budget script compiles the real sharded programs and converts the SPMD
partitioner's collectives into per-chip ICI bytes; these tests pin the
parsing/accounting helpers against hand-written HLO lines so the budget
numbers can be trusted without re-deriving them by eye.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from collective_budget import (  # noqa: E402
    _group_size,
    _shape_bytes,
    collect_collectives,
    per_chip_bytes,
)

HLO = """\
HloModule jit_step, entry_computation_layout={...}

ENTRY %main (p0: f32[128,256,256,1]) -> f32[] {
  %p0 = f32[128,256,256,1]{3,2,1,0} parameter(0)
  %ar = f32[1000]{0} all-reduce(f32[1000]{0} %x), replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
  %arv = (f32[1000]{0}, bf16[500]{0}) all-reduce(f32[1000]{0} %x, bf16[500]{0} %y), replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%add
  %ag = f32[128,8,8,64]{3,2,1,0} all-gather(f32[16,8,8,64]{3,2,1,0} %z), replica_groups=[1,8]<=[8], dimensions={0}
  %cp = bf16[4,32,512,64]{3,2,1,0} collective-permute(bf16[4,32,512,64]{3,2,1,0} %h), source_target_pairs={{0,1},{1,0}}
  %rs = f32[125]{0} reduce-scatter(f32[1000]{0} %x), replica_groups=[1,8]<=[8], dimensions={0}, to_apply=%add
  %done = f32[1000]{0} all-reduce-done(f32[1000]{0} %start)
  ROOT %out = f32[] constant(0)
}
"""


def test_shape_bytes():
    assert _shape_bytes("f32[1000]{0}") == 4000
    assert _shape_bytes("(f32[1000]{0}, bf16[500]{0})") == 4000 + 1000
    assert _shape_bytes("bf16[4,32,512,64]{3,2,1,0}") == 4 * 32 * 512 * 64 * 2
    assert _shape_bytes("f32[]") == 4  # scalar
    # token/opaque types carry no payload
    assert _shape_bytes("token[]") == 0


def test_group_size():
    assert _group_size("replica_groups={{0,1,2,3,4,5,6,7}}", 8) == 8
    assert _group_size("replica_groups={{0,1,2,3},{4,5,6,7}}", 8) == 4
    assert _group_size("replica_groups=[2,4]<=[8]", 8) == 4
    assert _group_size("replica_groups=[1,8]<=[8]", 8) == 8
    assert _group_size("no groups here", 8) == 8


def test_collect_collectives():
    ops = collect_collectives(HLO, 8)
    kinds = [op for op, _, _ in ops]
    # -done lines are skipped; parameter/constant lines don't match
    assert kinds == [
        "all-reduce",
        "all-reduce",
        "all-gather",
        "collective-permute",
        "reduce-scatter",
    ]
    by_kind = {op: (nbytes, group) for op, nbytes, group in ops}
    assert by_kind["all-gather"] == (128 * 8 * 8 * 64 * 4, 8)
    assert by_kind["reduce-scatter"] == (125 * 4, 8)
    # variadic all-reduce sums its tuple, group from the brace list
    assert ops[1] == ("all-reduce", 5000, 4)


def test_per_chip_bytes_ring_factors():
    # all-reduce: 2*B*(N-1)/N
    assert per_chip_bytes("all-reduce", 4000, 8) == 2 * 4000 * 7 / 8
    # all-gather: out is global, traffic = out*(N-1)/N
    assert per_chip_bytes("all-gather", 8000, 8) == 8000 * 7 / 8
    # reduce-scatter: out is the shard, in = out*N, traffic = in*(N-1)/N
    assert per_chip_bytes("reduce-scatter", 500, 8) == 500 * 8 * 7 / 8
    # permute: exactly the payload
    assert per_chip_bytes("collective-permute", 1234, 8) == 1234
    # degenerate single-member group: no traffic
    assert per_chip_bytes("all-reduce", 4000, 1) == 0.0
