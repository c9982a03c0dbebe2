"""Probe the real MXU ceiling through the axon tunnel: matmul vs conv.

Distinguishes "conv lowering is inefficient" (matmul >> conv TFLOPs)
from "the chip/tunnel caps at ~40 TFLOPs" (both low). Chained timing per
CLAUDE.md (block_until_ready doesn't sync through the tunnel).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 30


def chain_time(name, fn, x0, flops, n=N):
    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x.astype(jnp.float32))

    float(chained(x0))
    t0 = time.perf_counter()
    float(chained(x0))
    ms = (time.perf_counter() - t0) * 1000 / n
    print(f"{name:58s} {ms:8.2f} ms  {flops / (ms / 1e3) / 1e12:7.1f} TFLOPs")


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    # 1. Pure bf16 matmul, 4096^3 (134 GFLOP): the MXU speed-of-light probe.
    m = 4096
    a = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.bfloat16)

    def mm(x):
        y = x @ a
        return y / jnp.float32(m).astype(jnp.bfloat16)  # keep magnitudes sane

    chain_time(f"matmul {m}^3 bf16", mm, a, 2 * m**3)

    # f32 for comparison
    af = jnp.asarray(rng.standard_normal((m, m)), dtype=jnp.float32)

    def mmf(x):
        y = x @ af
        return y / np.float32(m)

    chain_time(f"matmul {m}^3 f32", mmf, af, 2 * m**3)

    # 2. The workhorse conv: 3x3, 256->256ch @ 64^2, batch 16 (77 GFLOP).
    B = 16
    feat = jnp.asarray(rng.standard_normal((B, 64, 64, 256)) * 0.1, dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.01, dtype=jnp.bfloat16)
    conv_flops = 2 * 9 * 256 * 256 * 64 * 64 * B

    def conv(z):
        y = jax.lax.conv_general_dilated(
            z, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y * jnp.bfloat16(0.1)

    chain_time("conv3x3 256->256 @64^2 b16 bf16 NHWC", conv, feat, conv_flops)

    # 2b. Same conv with explicit f32 accumulation type.
    def conv_pf(z):
        y = jax.lax.conv_general_dilated(
            z, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y * 0.1).astype(jnp.bfloat16)

    chain_time("conv3x3 256->256 @64^2 pref_f32", conv_pf, feat, conv_flops)

    # 2c. The same math as an im2col matmul: [B*64*64, 9*256] @ [9*256, 256].
    k_mat = k.reshape(9 * 256, 256)

    def conv_im2col(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.concatenate(
            [
                zp[:, dy : dy + 64, dx : dx + 64, :]
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )  # [B,64,64,9*256]
        y = patches.reshape(-1, 9 * 256) @ k_mat
        return y.reshape(z.shape) * jnp.bfloat16(0.1)

    chain_time("conv3x3 as im2col matmul bf16", conv_im2col, feat, conv_flops)

    # 3. The 64-channel high-res conv (lane-padding suspect).
    big = jnp.asarray(
        rng.standard_normal((B, 256, 256, 64)) * 0.1, dtype=jnp.bfloat16
    )
    kb = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.01, dtype=jnp.bfloat16)
    big_flops = 2 * 9 * 64 * 64 * 256 * 256 * B

    def convb(z):
        y = jax.lax.conv_general_dilated(
            z, kb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y * jnp.bfloat16(0.1)

    chain_time("conv3x3 64->64 @256^2 b16 bf16", convb, big, big_flops)

    # 3b. Same FLOPs via space-to-depth: @128^2 with 256 channels, 3x3 conv
    # on the packed layout (NOT math-equivalent; a layout ceiling probe).
    s2d = jnp.asarray(
        rng.standard_normal((B, 128, 128, 256)) * 0.1, dtype=jnp.bfloat16
    )
    ks = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.01, dtype=jnp.bfloat16)

    def convs2d(z):
        y = jax.lax.conv_general_dilated(
            z, ks, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y * jnp.bfloat16(0.1)

    chain_time(
        "conv3x3 256->256 @128^2 (s2d layout probe)",
        convs2d,
        s2d,
        2 * 9 * 256 * 256 * 128 * 128 * B,
    )

    # 4. Batch scaling: does batch 64 lift conv efficiency @64^2?
    feat64 = jnp.asarray(
        rng.standard_normal((64, 64, 64, 256)) * 0.1, dtype=jnp.bfloat16
    )
    chain_time(
        "conv3x3 256->256 @64^2 b64 bf16", conv, feat64, conv_flops * 4
    )


if __name__ == "__main__":
    main()
