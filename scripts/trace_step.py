"""Capture a jax.profiler trace of the fused train step and print the
op-level time breakdown (the ground truth behind BASELINE.md's ceiling
analysis — no more inferring from chained microbenchmarks).

Parses the .xplane.pb with tensorboard_plugin_profile's vendored protobuf:
aggregates TPU-device plane events by name, prints the top ops and a
category rollup (conv fwd/bwd, matmul/einsum, fusions = elementwise+IN,
copies/transposes, dynamic-update = buffer, misc).

Usage: python scripts/trace_step.py [batch] [size] [steps_per_trace]
"""

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

TRACE_DIR = Path("/tmp/otm_trace")


def capture(batch: int, size: int, k: int) -> None:
    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import Batches, make_multi_step
    from one_to_many_gan_tpu.presets import tiny_config

    import os

    config = tiny_config(
        (size, size),
        batch,
        min_latent=64,
        tpu={
            "precision": "bfloat16",
            # match bench.py's default operating point
            "ada_pallas": os.environ.get("OTM_TRACE_ADA_PALLAS", "1") == "1",
            "remat": os.environ.get("OTM_TRACE_REMAT", "none"),
            "remat_d": os.environ.get("OTM_TRACE_REMAT_D", "same"),
        },
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    rng = np.random.default_rng(0)

    # OTM_TRACE_SPLIT=1 traces the split-phase operating point (two jitted
    # programs per step — the 512² configuration); the parse aggregates
    # device events across both programs.
    if os.environ.get("OTM_TRACE_SPLIT", "0") == "1":
        from one_to_many_gan_tpu.core.train_step import make_phase_fns

        d_phase, g_phase = make_phase_fns(config, models)
        d_jit = jax.jit(d_phase)
        g_jit = jax.jit(g_phase)

        def mk1():
            return jax.device_put(
                (rng.random((batch, size, size, 1)) * 2 - 1).astype(np.float32)
            )

        batches1 = Batches(mk1(), mk1(), mk1(), mk1())

        def run_k(state):
            gm = None
            for i in range(k):
                key = jax.random.key(50 + i)
                state, dm = d_jit(state, batches1, key)
                state, gm = g_jit(state, batches1, key, dm["ada_p"])
            return state, gm

        state2, gm = run_k(state)  # compile + warm
        float(gm["total_gen_loss"])
        jax.profiler.start_trace(str(TRACE_DIR))
        _, gm = run_k(state)
        float(gm["total_gen_loss"])  # host read = real sync
        jax.profiler.stop_trace()
        return

    # k == 1 traces the UNSCANNED step (make_train_step): a lax.scan body
    # shows up as one opaque `while` op in the profile, hiding per-op
    # attribution.
    if k == 1:
        from one_to_many_gan_tpu.core.train_step import make_train_step

        single = make_train_step(config, models)
        step = jax.jit(
            lambda s, b, ks: single(s, Batches(*(x[0] for x in b)), ks[0])
        )
    else:
        step = jax.jit(make_multi_step(config, models, k))

    def mk():
        return jax.device_put(
            (rng.random((k, batch, size, size, 1)) * 2 - 1).astype(np.float32)
        )

    batches = Batches(mk(), mk(), mk(), mk())
    keys = jax.random.split(jax.random.key(9), k)
    # compile + warm
    _, metrics = step(state, batches, keys)
    float(jnp.max(metrics["total_gen_loss"]))

    jax.profiler.start_trace(str(TRACE_DIR))
    _, metrics = step(state, batches, keys)
    float(jnp.max(metrics["total_gen_loss"]))  # host read = real sync
    jax.profiler.stop_trace()


def parse(k: int) -> None:
    import gzip
    import json

    paths = sorted(TRACE_DIR.glob("**/*.trace.json.gz"))
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["args"].get("name") == "XLA Ops"
        and e["pid"] in device_pids
    }

    durations: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        durations[name] += e.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1
    if not durations:
        print("no device op events found; pids:", device_pids)
        return

    total = sum(durations.values())
    print(f"total device op time: {total:.1f} ms over {k} steps "
          f"({total / k:.1f} ms/step)\n")

    def category(name: str) -> str:
        n = name.lower()
        if "convolution" in n or "conv" in n:
            return "conv"
        if "dot" in n or "einsum" in n:
            return "matmul"
        if "dynamic-update" in n or "dynamic_update" in n:
            return "dynamic-update (buffer)"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copy/relayout"
        if "all-reduce" in n or "reduce-scatter" in n:
            return "collective"
        if "fusion" in n:
            return "fusion (elementwise/IN/reduce)"
        return "other"

    cats: dict[str, float] = defaultdict(float)
    for name, d in durations.items():
        cats[category(name)] += d
    print("by category (ms/step):")
    for cat, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:34s} {d / k:8.2f}  ({100 * d / total:4.1f}%)")

    print("\ntop 45 ops (ms/step):")
    for name, d in sorted(durations.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {d / k:8.3f}  x{counts[name] // k:<4d} {name[:110]}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    capture(batch, size, k)
    parse(k)
