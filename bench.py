"""Benchmark: fused-train-step throughput at 256x256 on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Definition: images/sec = batch_size * fused_steps/sec. One fused step is a
full training iteration (discriminator update + generator update + ADA +
replay buffer), i.e. the same unit of work as one iteration of the
reference's loop (reference train.py:204-251).

Operating point: bfloat16 conv/matmul activations (f32 params, f32
norm/style/loss statistics) — the intended TPU-native training
configuration (BASELINE.json config 3). Override with env vars:
OTM_BENCH_BATCH, OTM_BENCH_PRECISION (float32|bfloat16), OTM_BENCH_REMAT,
OTM_BENCH_SIZE, OTM_BENCH_STEPS.

Timing note: this environment's block_until_ready does not synchronize
through the axon TPU tunnel, so the measured region chains MEASURE_STEPS
data-dependent steps (donated state) and closes with a device->host scalar
read; the ~30ms round-trip is amortized across the chain.

Baseline denominator: the reference publishes NO numbers (BASELINE.md), so
``vs_baseline`` is computed against an estimate of the reference's
single-GPU throughput at 256^2: the reference runs batch 4 with ~11 full
network passes per iteration (1 D pass over 2x batch, 6 decoder + 1
encoder + 2 extractor + 1 D pass in the G step), per-sample grouped convs
for every modulated layer, and per-step host sync; comparable StyleGAN2-
class research trainers sustain roughly 4-8 it/s at this size on a modern
datacenter GPU -> ~5 it/s * 4 img = 20 img/s. Recalibrate
REFERENCE_GPU_IMG_PER_SEC when a measured reference number exists.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Documented estimate; see module docstring. A measured same-host CPU-vs-CPU
# lower bound on the speedup ratio lives in BASELINE.md ("baseline
# denominator" section) — the 20 img/s GPU figure stays the official
# denominator until a real reference GPU run exists.
REFERENCE_GPU_IMG_PER_SEC = 20.0

BATCH = int(os.environ.get("OTM_BENCH_BATCH", "16"))
IMAGE_SIZE = int(os.environ.get("OTM_BENCH_SIZE", "256"))
PRECISION = os.environ.get("OTM_BENCH_PRECISION", "bfloat16")
# remat mode: none|conv|full ("0"/"1" accepted for back-compat)
REMAT = {"0": "none", "1": "full"}.get(
    os.environ.get("OTM_BENCH_REMAT", "none"),
    os.environ.get("OTM_BENCH_REMAT", "none"),
)
WARMUP_STEPS = 3
MEASURE_STEPS = int(os.environ.get("OTM_BENCH_STEPS", "20"))
# Split D/G into two jitted programs (halved per-program activation peak,
# one extra dispatch per step) — the 512^2 memory/batch lever.
SPLIT = os.environ.get("OTM_BENCH_SPLIT", "0") == "1"
REMAT_D = os.environ.get("OTM_BENCH_REMAT_D", "same")
# Split the G backward into two accumulated sub-backwards (the 512²
# memory lever on top of SPLIT; tpu.g_loss_split).
G_SPLIT = os.environ.get("OTM_BENCH_G_SPLIT", "0") == "1"
# Lazy path-length regularization interval (tpu.path_interval; 1 =
# reference-exact every-step path term). Measured throughput amortizes
# over MEASURE_STEPS, which should be a multiple of the interval.
# Default 8 = the flagship operating point: +22.2% over interval=1
# (BASELINE.md round-5 rows; 59.1 vs 48.4 img/s), with training-
# equivalence evidence at this exact config — identical-RNG 3k-step
# interval-8-vs-1 AND interval-4-vs-1 runs in docs/dynamics/ (the 512²
# flagship config ships interval 8 on the same evidence pattern).
# Set OTM_BENCH_PATH_INTERVAL=1 for the reference-exact every-step math.
PATH_INTERVAL = int(os.environ.get("OTM_BENCH_PATH_INTERVAL", "8"))


def _emit_unavailable(detail: str) -> None:
    """Emit the machine-readable failure record (still ONE JSON line)."""
    print(
        json.dumps(
            {
                "metric": f"train_images_per_sec_per_chip_{IMAGE_SIZE}x{IMAGE_SIZE}",
                "value": None,
                "unit": "images/sec/chip",
                "vs_baseline": None,
                "error": "tpu_unavailable",
                "detail": detail[:500],
            }
        )
    )


def probe_backend(timeout_s: int, attempts: int, backoff_s: float) -> str | None:
    """Probe device availability in a subprocess before committing to a run.

    The axon tunnel can be down for hours at a time, and a hung backend init
    cannot be interrupted in-process (CLAUDE.md: probe with ``timeout 110
    python -c "import jax; print(jax.devices())"``). Runs that probe as a
    child with a hard timeout, retrying ``attempts`` times with linear
    backoff. Returns None when a probe succeeds, else a short diagnostic
    string (the round's perf artifact then records a structured error
    instead of a bare traceback — VERDICT r3 #1).
    """
    last = "no attempts made"
    for i in range(attempts):
        if i:
            time.sleep(backoff_s * i)
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {timeout_s}s (attempt {i + 1}/{attempts})"
            continue
        if r.returncode == 0:
            return None
        tail = (r.stderr or r.stdout).strip().splitlines()
        last = (tail[-1] if tail else f"probe rc={r.returncode}") + (
            f" (attempt {i + 1}/{attempts})"
        )
    return last


def main() -> None:
    detail = probe_backend(
        timeout_s=int(os.environ.get("OTM_BENCH_PROBE_TIMEOUT", "110")),
        attempts=int(os.environ.get("OTM_BENCH_PROBE_ATTEMPTS", "3")),
        backoff_s=float(os.environ.get("OTM_BENCH_PROBE_BACKOFF", "30")),
    )
    if detail is not None:
        _emit_unavailable(detail)
        return

    try:
        _run()
    except RuntimeError as e:
        # the tunnel can still die between the probe and the run; keep the
        # artifact machine-readable for backend failures, re-raise real bugs
        msg = str(e)
        if "backend" in msg.lower() or "axon" in msg.lower():
            _emit_unavailable(f"mid-run backend failure: {msg}")
            return
        raise


def _run() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import Batches, make_multi_step
    from one_to_many_gan_tpu.presets import tiny_config

    config = tiny_config(
        (IMAGE_SIZE, IMAGE_SIZE),
        BATCH,
        min_latent=64,
        tpu={
            "precision": PRECISION,
            "remat": REMAT,
            "remat_d": REMAT_D,
            "split_phases": SPLIT,
            "g_loss_split": G_SPLIT,
            "path_interval": PATH_INTERVAL,
            # default ON: the fused VMEM warp kernel is exactness-tested
            # against the XLA path and measured +3% end-to-end (the bench
            # is single-chip; the kernel is gated off under spatial
            # sharding in Trainer)
            "ada_pallas": os.environ.get("OTM_BENCH_ADA_PALLAS", "1") == "1",
            "s2d_pack": os.environ.get("OTM_BENCH_S2D_PACK", "0") == "1",
        },
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    rng = np.random.default_rng(0)

    if SPLIT:
        from one_to_many_gan_tpu.core.train_step import make_phase_fns

        d_phase, g_phase = make_phase_fns(config, models)
        d_jit = jax.jit(d_phase, donate_argnums=0)
        g_jit = jax.jit(g_phase, donate_argnums=0)

        def mk1():
            return jax.device_put(
                (rng.random((BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)) * 2 - 1).astype(
                    np.float32
                )
            )

        batches1 = Batches(mk1(), mk1(), mk1(), mk1())

        def run_step(state, key):
            state, dm = d_jit(state, batches1, key)
            state, gm = g_jit(state, batches1, key, dm["ada_p"])
            return state, gm

        state, gm = run_step(state, jax.random.key(9))
        float(gm["total_gen_loss"])  # real sync (host read)
        t0 = time.perf_counter()
        for i in range(MEASURE_STEPS):
            state, gm = run_step(state, jax.random.key(100 + i))
        float(gm["total_gen_loss"])  # real sync (host read)
        dt = time.perf_counter() - t0
        images_per_sec = BATCH * MEASURE_STEPS / dt
        k = 1
    else:
        # scan K steps per jitted call (the production inner loop) to
        # amortize per-call dispatch overhead
        k = int(os.environ.get("OTM_BENCH_STEPS_PER_CALL", "10"))
        step = jax.jit(make_multi_step(config, models, k), donate_argnums=0)

        def mk():
            return jax.device_put(
                (rng.random((k, BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)) * 2 - 1).astype(
                    np.float32
                )
            )

        batches = Batches(mk(), mk(), mk(), mk())

        state, metrics = step(
            state, batches, jax.random.split(jax.random.key(9), k)
        )
        float(metrics["total_gen_loss"][-1])  # real sync (host read)

        n_calls = max(1, MEASURE_STEPS // k)
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, metrics = step(
                state, batches, jax.random.split(jax.random.key(100 + i), k)
            )
        float(metrics["total_gen_loss"][-1])  # real sync (host read)
        dt = time.perf_counter() - t0
        images_per_sec = BATCH * k * n_calls / dt
    print(
        json.dumps(
            {
                "metric": f"train_images_per_sec_per_chip_{IMAGE_SIZE}x{IMAGE_SIZE}",
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / REFERENCE_GPU_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
