"""Executable gate for the PRODUCTION-shape partitioning claims (VERDICT r4 #2).

`tests/test_step_sharding.py` pins the reshard-free property at a 32² toy
config; the claims about the FLAGSHIP programs — 256² b16/chip dp=8 fused
and 512² b4/chip split-phase — previously lived only in manually-run
`scripts/collective_budget.py` output. The s2d_out incident (silent wrong
values under H-sharding, BASELINE.md round 2) proves sharding bugs in
this class produce no error, so the claims are asserted here on the
compiled SPMD HLO of the REAL production programs every suite run:

- pure data parallelism (dp=8): the ONLY collectives are the gradient /
  global-statistic all-reduces and the replay buffer's single fakes
  all-gather — zero collective-permutes, zero all-to-alls (the batch_pack
  property at production shapes);
- dp=4 x sp=2 split-phase (spatial sharding): halo exchanges from the
  reflection pads and spatial reshards are expected, but the total
  per-chip ICI budget stays well under the pre-batch_pack level (8.5
  GB/chip/step) — a returning batch-axis reshard trips the ceiling.

Abstract lowering only (jax.eval_shape state, ShapeDtypeStruct batches):
nothing executes, so the 512² programs compile without 512² memory.
Compiles take minutes cold; the persistent CPU compile cache makes
repeat runs cheap.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

from collective_budget import (  # noqa: E402
    collect_collectives,
    make_programs,
    per_chip_bytes,
    production_config,
)
from one_to_many_gan_tpu.parallel import make_mesh  # noqa: E402


def _inventories(config, mesh, split):
    """{program: [(op, bytes, group)]} for the compiled SPMD programs."""
    out = {}
    for name, fn, args in make_programs(config, mesh, split):
        text = jax.jit(fn).lower(*args).compile().as_text()
        out[name] = collect_collectives(text, mesh.devices.size)
    return out


def _counts(ops):
    counts: dict[str, int] = {}
    for op, _, _ in ops:
        counts[op] = counts.get(op, 0) + 1
    return counts


def _total_mb(inventories) -> float:
    return sum(
        per_chip_bytes(op, nbytes, group)
        for ops in inventories.values()
        for op, nbytes, group in ops
    ) / 1e6


def test_flagship_256_dp8_fused_only_allreduces_and_buffer_gather():
    """The headline 256² b16/chip dp=8 fused program (batch_pack step),
    with the flagship lazy-path interval (bench.py default; BASELINE.md
    round-5) — the lax.cond compiles BOTH branches, so this single program
    gates the on- and off-step collective inventories."""
    mesh = make_mesh(8, 1)
    # interval=8 = the shipped bench.py default; the cond structure (and
    # therefore the collective inventory) is identical for any interval>1
    config = production_config(256, 16, 8, 1, path_interval=8)
    inv = _inventories(config, mesh, split=False)
    counts = _counts(inv["fused"])
    assert counts.get("collective-permute", 0) == 0, counts
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("reduce-scatter", 0) == 0, counts
    # the replay buffer's fakes all-gather (+ at most one output reslice)
    assert counts.get("all-gather", 0) <= 2, counts
    # gradient + global-statistic all-reduces must exist
    assert counts.get("all-reduce", 0) >= 1, counts
    # Static-HLO byte count. The lazy-path lax.cond compiles BOTH branches
    # and each carries its own grad all-reduces, so the static sum
    # double-counts them: measured 890 MB here vs 459 MB for the
    # interval=1 program (BASELINE.md round 4; 9009 MB before batch_pack).
    # Per-EXECUTED-step traffic is one branch ≈ the 459 MB level. Ceiling
    # sits between the cond double-count and the pre-batch_pack failure
    # mode so a returning batch-axis reshard still trips it.
    assert _total_mb(inv) < 1200, _total_mb(inv)


def test_flagship_512_dp8_split_only_allreduces_and_buffer_gather():
    """The 512² b4/chip dp=8 split-phase programs (the other dp=8 claim
    stated in the test_step_sharding comment)."""
    mesh = make_mesh(8, 1)
    config = production_config(512, 4, 8, 1, split_phases=True, path_interval=8)
    inv = _inventories(config, mesh, split=True)
    for name, ops in inv.items():
        counts = _counts(ops)
        assert counts.get("collective-permute", 0) == 0, (name, counts)
        assert counts.get("all-to-all", 0) == 0, (name, counts)
        assert counts.get("reduce-scatter", 0) == 0, (name, counts)
        assert counts.get("all-gather", 0) <= 2, (name, counts)
    # Static-HLO bytes: measured 3423 MB with the path_interval=8 cond
    # (both branches' grad all-reduces counted; executed per-step traffic
    # is one branch — the 1939 MB interval=1 level, f32 grad psums
    # dominating; BASELINE.md). Ceiling below the pre-batch_pack 8.5 GB
    # failure mode.
    assert _total_mb(inv) < 4400, _total_mb(inv)


@pytest.mark.slow
def test_flagship_512_dp4_sp2_split_budget_ceiling():
    """The spatial-sharding scenario: halos/spatial reshards are expected
    (reflection-pad concatenates along the sharded H axis), but total
    per-chip ICI must stay under the pre-batch_pack 8.5 GB level.
    Measured 4640 MB/chip/step (BASELINE.md round 4). Slow-marked: the
    sp=2 512² g_phase alone compiles ~3-5 min cold; the dp=8 gates above
    already run every suite invocation."""
    mesh = make_mesh(4, 2)
    config = production_config(512, 4, 4, 2, split_phases=True)
    inv = _inventories(config, mesh, split=True)
    total = _total_mb(inv)
    assert total < 6000, total
    # and batch-axis all-gathers don't multiply (buffer + reslices only)
    for name, ops in inv.items():
        counts = _counts(ops)
        assert counts.get("all-gather", 0) <= 8, (name, counts)
