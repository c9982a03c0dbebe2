"""A/B the ADA geometric warp: XLA tent-contraction vs the fused Pallas
VMEM kernel (ops/pallas/warp.py), at the train step's shapes. Chained
iterations inside one jit (tunnel timing rules, see CLAUDE.md)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from one_to_many_gan_tpu.augment.pipeline import geometric_matrix, warp_bilinear

GEOM = frozenset({"xflip", "rotate90", "xint", "scale", "rotate", "aniso", "xfrac"})


def chain(label, fn, x, n=30):
    def body(z, _):
        y = fn(z)
        return z + 0 * jnp.mean(y).astype(z.dtype), None

    @jax.jit
    def run(z):
        z, _ = jax.lax.scan(body, z, None, length=n)
        return jnp.mean(z)

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:34s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    for b, h, antialias in [(32, 256, True), (16, 256, True), (32, 256, False)]:
        x = jnp.asarray(
            rng.standard_normal((b, h, h, 1)).astype(np.float32)
        ).astype(jnp.bfloat16)
        g = geometric_matrix(
            jax.random.key(7), b, h, h, jnp.float32(0.9), GEOM
        )
        ref = lambda z: warp_bilinear(z, g, antialias=antialias)
        pal = lambda z: warp_bilinear(z, g, antialias=antialias, pallas=True)
        d = float(
            jnp.max(jnp.abs(ref(x).astype(jnp.float32) - pal(x).astype(jnp.float32)))
        )
        print(f"[b={b} {h}^2 aa={antialias}] maxdiff {d:.2e}")
        t1 = chain("XLA fwd", ref, x)
        t2 = chain("pallas fwd", pal, x)
        gref = jax.grad(lambda z: jnp.sum(ref(z).astype(jnp.float32) ** 2))
        gpal = jax.grad(lambda z: jnp.sum(pal(z).astype(jnp.float32) ** 2))
        t3 = chain("XLA fwd+bwd", lambda z: gref(z).astype(z.dtype), x)
        t4 = chain("pallas fwd+bwd", lambda z: gpal(z).astype(z.dtype), x)
        print(f"  -> fwd {t1/t2:4.2f}x   fwd+bwd {t3/t4:4.2f}x")


if __name__ == "__main__":
    main()
