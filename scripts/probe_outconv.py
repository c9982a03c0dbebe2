"""A/B the single-output-channel conv formulations at the generator
out-conv's shape: direct KxK Cin->1 conv vs tap-basis (1x1 conv to k*k tap
channels + fused shifted-slice sum). Chained-iteration timing (tunnel)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def direct(x, w):  # x [B,H+6,W+6,64] padded, w [7,7,64,1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def tap_basis(x, w):
    kh, kw, cin, _ = w.shape
    w_taps = jnp.moveaxis(w.reshape(kh * kw, cin), 0, 1)
    z = jax.lax.conv_general_dilated(
        x, w_taps[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h_out = x.shape[1] - kh + 1
    w_out = x.shape[2] - kw + 1
    acc = jnp.zeros((x.shape[0], h_out, w_out), jnp.float32)
    for t in range(kh * kw):
        ty, tx = divmod(t, kw)
        acc = acc + z[:, ty : ty + h_out, tx : tx + w_out, t].astype(jnp.float32)
    return acc[..., None].astype(x.dtype)


def chain(label, fn, x, w, n=30):
    def body(z, _):
        y = fn(z, w)
        return z + 0 * jnp.mean(y).astype(z.dtype), None

    @jax.jit
    def run(z):
        z, _ = jax.lax.scan(body, z, None, length=n)
        return jnp.mean(z)

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:28s} {dt:8.3f} ms")
    return dt


def chain_grad(label, fn, x, w, n=30):
    g = jax.grad(
        lambda z, ww: jnp.sum(fn(z, ww).astype(jnp.float32) ** 2), argnums=(0, 1)
    )

    def wrapped(z, ww):
        gz, gw = g(z, ww)
        return gz + 0 * jnp.sum(gw).astype(z.dtype)

    return chain(label, wrapped, x, w, n)


def main():
    rng = np.random.default_rng(0)
    for b in (16, 48):
        x = jnp.asarray(
            rng.standard_normal((b, 262, 262, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((7, 7, 64, 1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        d = float(
            jnp.max(
                jnp.abs(
                    direct(x, w).astype(jnp.float32)
                    - tap_basis(x, w).astype(jnp.float32)
                )
            )
        )
        print(f"[b={b}] maxdiff {d:.2e}")
        t1 = chain("direct fwd", direct, x, w)
        t2 = chain("tap-basis fwd", tap_basis, x, w)
        t3 = chain_grad("direct fwd+bwd", direct, x, w)
        t4 = chain_grad("tap-basis fwd+bwd", tap_basis, x, w)
        print(f"  -> fwd {t1/t2:4.2f}x   fwd+bwd {t3/t4:4.2f}x")


if __name__ == "__main__":
    main()
