"""Probe 2: separate fixed per-op overhead from steady-state rates.

Each scan iteration runs K data-dependent copies of the op; the marginal
cost of op #2..K is overhead-free. Also probes bigger matmuls and the
128-channel mid-level conv shapes.
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

N = 20


def chain_time_k(name, fn, x0, flops, k, n=N):
    """Time an op chained k times INSIDE each scan iteration."""

    @jax.jit
    def chained(x):
        def body(x, _):
            for _ in range(k):
                x = fn(x)
            return x, None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x.astype(jnp.float32))

    float(chained(x0))
    t0 = time.perf_counter()
    float(chained(x0))
    ms = (time.perf_counter() - t0) * 1000 / (n * k)
    print(f"{name:58s} {ms:8.3f} ms/op  {flops / (ms / 1e3) / 1e12:7.1f} TFLOPs")
    return ms


def main():
    rng = np.random.default_rng(0)

    # matmul at 3 sizes: fixed overhead shows as rate rising with size
    for m in (4096, 8192):
        a = jnp.asarray(rng.standard_normal((m, m)) * 0.01, dtype=jnp.bfloat16)

        def mm(x, a=a, m=m):
            return (x @ a) * jnp.bfloat16(0.1)

        chain_time_k(f"matmul {m}^3 bf16 k=1", mm, a, 2 * m**3, 1)
        chain_time_k(f"matmul {m}^3 bf16 k=8", mm, a, 2 * m**3, 8)

    def mkconv(c_in, c_out, size, batch, kk=3):
        feat = jnp.asarray(
            rng.standard_normal((batch, size, size, c_in)) * 0.1, dtype=jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((kk, kk, c_in, c_out)) * 0.01, dtype=jnp.bfloat16
        )

        def conv(z):
            y = jax.lax.conv_general_dilated(
                z, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return y * jnp.bfloat16(0.1)

        flops = 2 * kk * kk * c_in * c_out * size * size * batch
        return feat, conv, flops

    cases = [
        ("conv3x3 256ch @64^2 b16", 256, 256, 64, 16),
        ("conv3x3 256ch @64^2 b48", 256, 256, 64, 48),
        ("conv3x3 128ch @128^2 b16", 128, 128, 128, 16),
        ("conv3x3 128ch @128^2 b48", 128, 128, 128, 48),
        ("conv3x3 64ch @256^2 b16", 64, 64, 256, 16),
        ("conv3x3 64ch @256^2 b48", 64, 64, 256, 48),
        ("conv3x3 64->128 @256^2 b16", 64, 128, 256, 16),
        ("conv3x3 128->64 @256^2 b16", 128, 64, 256, 16),
    ]
    for name, ci, co, size, b in cases:
        if ci == co:
            feat, conv, flops = mkconv(ci, co, size, b)
            chain_time_k(f"{name} k=4", conv, feat, flops, 4)
        else:
            # alternate the two directions so shapes chain
            f1, c1, fl1 = mkconv(ci, co, size, b)
            f2, c2, fl2 = mkconv(co, ci, size, b)

            def duo(z, c1=c1, c2=c2):
                return c2(c1(z))

            chain_time_k(f"{name} pair k=2", duo, f1, fl1 + fl2, 2)

    # s2d-equivalent of the 64ch@256^2 conv: 2x2 kernel, 256ch @128^2
    feat = jnp.asarray(
        rng.standard_normal((16, 128, 128, 256)) * 0.1, dtype=jnp.bfloat16
    )
    k22 = jnp.asarray(
        rng.standard_normal((2, 2, 256, 256)) * 0.01, dtype=jnp.bfloat16
    )

    def conv22(z):
        y = jax.lax.conv_general_dilated(
            z, k22, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y * jnp.bfloat16(0.1)

    chain_time_k(
        "conv2x2 256ch @128^2 b16 (s2d of 64ch@256^2) k=4",
        conv22,
        feat,
        2 * 4 * 256 * 256 * 128 * 128 * 16,
        4,
    )


if __name__ == "__main__":
    main()
