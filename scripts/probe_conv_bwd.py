"""Forward AND backward conv rates for the fused step's dominant shapes.

probe_mxu2.py measured forward conv rates; the training step spends ~2/3
of its conv FLOPs in backward convs (grad-input: transposed spatial
kernel; grad-weight: contraction over batch*spatial), whose TPU
efficiency differs from forward. This probe measures the marginal cost of
fwd, fwd+bwd (both grads), and derives the effective fwd+bwd rate used in
BASELINE.md's ceiling arithmetic.

Chained timing (K ops per scan iteration) per CLAUDE.md: never time
per-call through the axon tunnel.
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

N = 8  # scan length
K = 4  # ops per iteration (amortize per-iteration overhead)

# (size, cin, cout, kernel, batch) — the fused step's conv population at
# 256^2 (decode runs at 3x the global batch 16 = 48; encode/extract at 32)
SHAPES = [
    (256, 64, 64, 3, 16),
    (256, 64, 64, 3, 48),
    (256, 64, 128, 3, 32),
    (128, 128, 256, 3, 32),
    (64, 256, 256, 3, 16),
    (64, 256, 256, 3, 48),
    (128, 256, 128, 3, 48),
]


def time_chain(fn, x0):
    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None

        x, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(x.astype(jnp.float32))

    float(chained(x0))
    t0 = time.perf_counter()
    float(chained(x0))
    return (time.perf_counter() - t0) * 1000 / N


def main():
    print(f"bf16 NHWC, chain {N}x{K}")
    print(f"{'shape':34s} {'fwd TF/s':>9s} {'f+b TF/s':>9s} {'bwd TF/s':>9s}")
    for size, cin, cout, k, batch in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((batch, size, size, cin)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16
        )
        proj = jnp.asarray(
            rng.standard_normal((k, k, cout, cin)) * 0.05, jnp.bfloat16
        )

        def conv(z, w_):
            return jax.lax.conv_general_dilated(
                z, w_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fwd(z):
            for _ in range(K):
                z = conv(z, w)
                z = conv(z, proj)  # back to cin so the chain composes
            return z

        flops_one = 2 * k * k * cin * cout * size * size * batch

        def fwdbwd(z):
            def loss(w_):
                zz = z
                for _ in range(K):
                    zz = conv(zz, w_)
                    zz = conv(zz, proj)
                return jnp.sum(zz.astype(jnp.float32))

            g = jax.grad(loss)(w)
            return z + jnp.mean(g).astype(z.dtype) * 1e-6

        t_f = time_chain(fwd, x)
        t_fb = time_chain(fwdbwd, x)
        # fwd chain: 2K convs; fwd+bwd: 2K fwd + 4K bwd convs (grad-input
        # and grad-weight per conv)
        r_f = 2 * K * flops_one / (t_f * 1e-3) / 1e12
        r_fb = 6 * K * flops_one / (t_fb * 1e-3) / 1e12
        r_b = 4 * K * flops_one / ((t_fb - t_f) * 1e-3) / 1e12
        name = f"conv{k}x{k} {cin}->{cout} @{size}^2 b{batch}"
        print(f"{name:34s} {r_f:9.1f} {r_fb:9.1f} {r_b:9.1f}")


if __name__ == "__main__":
    main()
