"""Collective-traffic budget for scale-out (evidence for docs/SCALING.md).

The reference is single-GPU, so there is no reference number to beat here;
this pins OUR scaling projection ("gradient psum is small next to the
step", docs/SCALING.md) with the compiled programs' ACTUAL communication
volume instead of an argument:

1. Compile the REAL production train-step programs over an 8-virtual-
   device CPU mesh via abstract lowering (``jax.eval_shape`` for the state,
   ``ShapeDtypeStruct`` batches — nothing executes, so production 512²
   programs compile without production memory).
2. Parse every collective op out of the compiled SPMD HLO (all-reduce /
   all-gather / reduce-scatter / collective-permute, sync and async
   ``-start`` forms), with its element type, shape, and replica-group size.
3. Convert to per-chip ICI bytes with the standard ring-algorithm factors
   (all-reduce moves 2·B·(N-1)/N per chip, gather/scatter B·(N-1)/N,
   permute B).
4. Combine with the MEASURED single-chip step times (BASELINE.md) and the
   public v5e ICI bandwidth to predict multi-chip scaling efficiency.

ICI model (documented assumption, parameterize via OTM_ICI_GBS): one v5e
ICI link sustains ~45 GB/s per direction (public "How to Scale Your
Model" v5e figure). A ring all-reduce keeps one link busy each way, so we
charge all per-chip traffic against a single 45 GB/s lane — conservative:
2D-torus slices give XLA two orthogonal rings to split traffic across.

Run on CPU (the script forces the backend):
    python scripts/collective_budget.py
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

import jax.numpy as jnp  # noqa: E402

from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.core.train_step import (  # noqa: E402
    Batches,
    make_phase_fns,
    make_train_step,
)
from one_to_many_gan_tpu.parallel import make_mesh  # noqa: E402
from one_to_many_gan_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    replicated,
)
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402

ICI_GBS = float(os.environ.get("OTM_ICI_GBS", "45"))  # GB/s per direction

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# One tensor inside an HLO shape string: dtype[d0,d1,...] (scalars: dtype[])
_TENSOR_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(?P<shape>\([^)]*\)|[\w\[\],{}/ ]+?)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(?:-start)?\(",
)
_GROUPS_BRACE_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=\[\d+\]")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _TENSOR_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque types carry no payload
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str, default: int) -> int:
    m = _GROUPS_BRACE_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(2))
    return default


def collect_collectives(hlo_text: str, n_devices: int):
    """[(op, out_bytes, group_size)] for every collective in the module."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        if "-done(" in line:
            continue  # async -done pairs with its -start; count once
        out.append(
            (m.group("op"), _shape_bytes(m.group("shape")), _group_size(line, n_devices))
        )
    return out


def per_chip_bytes(op: str, out_bytes: int, group: int) -> float:
    """Ring-algorithm per-chip ICI traffic (one direction counted)."""
    if group <= 1:
        return 0.0
    frac = (group - 1) / group
    if op == "all-reduce":
        return 2.0 * out_bytes * frac  # reduce-scatter + all-gather phases
    if op == "all-gather":
        return out_bytes * frac  # out is the gathered (global) shape
    if op == "reduce-scatter":
        return out_bytes * group * frac  # out is the scattered shard
    if op == "collective-permute":
        return float(out_bytes)
    if op == "all-to-all":
        return out_bytes * frac
    return 0.0


def abstractify(tree, sharding):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding), tree
    )


def budget(label: str, config, programs, mesh, step_ms: float | None):
    """Compile each (name, fn, args) program, aggregate collective traffic."""
    n = mesh.devices.size
    print(f"\n=== {label} (mesh {mesh.devices.shape}, {n} devices)")
    total_bytes = 0.0
    rows: dict[str, list[float]] = {}
    for name, fn, args in programs:
        compiled = jax.jit(fn).lower(*args).compile()
        text = compiled.as_text()
        if os.environ.get("OTM_BUDGET_DUMP"):
            dump = Path(f"/tmp/budget_{name}.hlo")
            dump.write_text(text)
            print(f"  [dumped HLO to {dump}]")
        ops = collect_collectives(text, n)
        for op, nbytes, group in ops:
            b = per_chip_bytes(op, nbytes, group)
            rows.setdefault(op, [0, 0.0])
            rows[op][0] += 1
            rows[op][1] += b
            total_bytes += b
        flops = compiled.cost_analysis().get("flops", 0.0)
        print(
            f"  program {name}: {len(ops)} collectives, "
            f"{flops / 1e9:.1f} GFLOP (per-step, global)"
        )
    for op, (count, nbytes) in sorted(rows.items()):
        print(f"    {op:20s} x{count:<3d} {nbytes / 1e6:10.2f} MB/chip/step")
    t_ici_ms = total_bytes / (ICI_GBS * 1e9) * 1e3
    print(f"  TOTAL ICI traffic: {total_bytes / 1e6:.2f} MB/chip/step "
          f"-> {t_ici_ms:.2f} ms at {ICI_GBS:.0f} GB/s/direction")
    if step_ms is not None:
        eff_serial = step_ms / (step_ms + t_ici_ms)
        eff_overlap = min(1.0, step_ms / max(step_ms, t_ici_ms))
        print(
            f"  measured single-chip step {step_ms:.0f} ms -> predicted "
            f"{n}-chip efficiency {eff_serial * 100:.1f}% (no overlap) / "
            f"{eff_overlap * 100:.1f}% (perfect overlap)"
        )
    return total_bytes, t_ici_ms


def production_config(size: int, per_chip_batch: int, dp: int, sp: int, **tpu):
    """Production architecture (default.toml arithmetic) at the given size."""
    return tiny_config(
        (size, size),
        per_chip_batch * dp,
        min_latent=64,
        w_dim=6,
        n_resnet_blocks=7,
        buffer_size=100,
        tpu={
            "precision": "bfloat16",
            "data_parallel": dp,
            "spatial_parallel": sp,
            "ada_pallas": False,  # budget the XLA warp path (no SPMD rule
            # for the Pallas kernel; Trainer shard_maps it over dp only)
            **tpu,
        },
        ada={"ada_overfitting_measurement_n_images": 256},
    )


def make_programs(config, mesh, split: bool):
    models = Models(config)
    state_abs = jax.eval_shape(
        lambda k: init_train_state(config, models, k), jax.random.key(0)
    )
    param_bytes = sum(
        x.size * x.dtype.itemsize
        for tree in (
            state_abs.params_g,
            state_abs.params_d,
            state_abs.params_m,
            state_abs.params_s,
        )
        for x in jax.tree.leaves(tree)
    )
    print(
        f"  model parameters: {param_bytes / 1e6:.1f} MB "
        f"(ring grad all-reduce moves ~2x this per chip per step)"
    )
    state_abs = abstractify(state_abs, replicated(mesh))
    b = config["training"]["batch_size"]
    h, w = config["data"]["image_size"]
    img = jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32, sharding=batch_sharding(mesh))
    batches = Batches(img, img, img, img)
    key = jax.random.key(1)
    if not split:
        step = make_train_step(config, models, mesh)
        return [("fused", step, (state_abs, batches, key))]
    d_phase, g_phase = make_phase_fns(config, models, mesh)
    p_abs = jax.ShapeDtypeStruct((), jnp.float32, sharding=replicated(mesh))
    return [
        ("d_phase", d_phase, (state_abs, batches, key)),
        ("g_phase", g_phase, (state_abs, batches, key, p_abs)),
    ]


def main() -> None:
    if os.environ.get("OTM_BUDGET_SMOKE") == "1":
        # Plumbing check: tiny structural config, both program forms.
        config = tiny_config(
            (32, 32), 8, min_latent=8,
            tpu={"data_parallel": 4, "spatial_parallel": 2,
                 "ada_pallas": False, "split_phases": True},
        )
        mesh = make_mesh(4, 2)
        budget("smoke 32² 4x2 split", config,
               make_programs(config, mesh, True), mesh, None)
        mesh = make_mesh(8, 1)
        config = tiny_config(
            (32, 32), 8, min_latent=8,
            tpu={"data_parallel": 8, "ada_pallas": False},
        )
        budget("smoke 32² 8x1 fused", config,
               make_programs(config, mesh, False), mesh, None)
        return

    # Measured single-chip step times (BASELINE.md): 256² b16 fused
    # ~50 img/s -> 320 ms; 512² b4 split-phase ~8.07 img/s -> 496 ms.
    scenarios = [
        ("256² b16/chip, dp=8 fused (flagship 256 point)",
         production_config(256, 16, 8, 1), 8, 1, False, 320.0),
        ("512² b4/chip, dp=8 split-phase (flagship 512 point)",
         production_config(512, 4, 8, 1, split_phases=True),
         8, 1, True, 496.0),
        ("512² b4/chip, dp=4 x sp=2 split-phase (halo traffic)",
         production_config(512, 4, 4, 2, split_phases=True),
         4, 2, True, 496.0),
    ]
    only = os.environ.get("OTM_BUDGET_ONLY")
    for label, config, dp, sp, split, step_ms in scenarios:
        if only and only not in label:
            continue
        mesh = make_mesh(dp, sp)
        budget(label, config, make_programs(config, mesh, split), mesh, step_ms)


if __name__ == "__main__":
    main()
