"""Chained component profiling: run each op N times data-dependently inside
ONE jitted program, sync once, divide. Removes the ~30ms tunnel round-trip
floor that poisons per-call timing on this axon TPU setup.
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

from one_to_many_gan_tpu.augment import augment  # noqa: E402
from one_to_many_gan_tpu.core.buffer import buffer_apply, init_buffer  # noqa: E402
from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.ops import downsample2x, instance_norm, upsample2x  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402

BATCH = 8
SIZE = 256
N = 20


def chain_time(name, fn, x0, n=N):
    """fn: x -> x (same shape/dtype). Times n chained applications."""

    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x.astype(jnp.float32))

    float(chained(x0))  # compile + warm
    t0 = time.perf_counter()
    float(chained(x0))
    total = (time.perf_counter() - t0) * 1000
    print(f"{name:42s} {(total) / n:8.2f} ms/iter   ({total:7.1f} ms total)")


def main():
    print(f"device: {jax.devices()[0]}, batch {BATCH}, {SIZE}x{SIZE}, chain {N}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))
    feat = jnp.asarray(
        rng.standard_normal((BATCH, SIZE // 4, SIZE // 4, 256)).astype(np.float32)
    )

    config = tiny_config((SIZE, SIZE), BATCH, min_latent=64)
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    gen, disc = models.generator, models.discriminator
    n_blocks, w_dim = models.n_style_blocks, models.w_dim
    w = jnp.asarray(rng.standard_normal((n_blocks, BATCH, w_dim)).astype(np.float32))

    # calibration: known-cost conv. 77 GFLOP
    kconv = jnp.asarray(rng.standard_normal((3, 3, 256, 256)).astype(np.float32) * 0.01)
    chain_time(
        "conv3x3 256ch @64^2 (77 GFLOP)",
        lambda z: jax.lax.conv_general_dilated(
            z, kconv, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        feat,
    )

    chain_time("G fwd (enc+dec)", lambda z: gen.apply(state.params_g, z, w), x)

    def g_fwd_bwd(z):
        g = jax.grad(
            lambda pp: jnp.sum(gen.apply(pp, z, w).astype(jnp.float32))
        )(state.params_g)
        leaf = jax.tree.leaves(g)[0]
        return z + 1e-12 * jnp.mean(leaf)

    chain_time("G fwd+bwd(params)", g_fwd_bwd, x)

    def d_fwd_bwd(z):
        g = jax.grad(
            lambda pp: jnp.sum(disc.apply(pp, z).astype(jnp.float32))
        )(state.params_d)
        leaf = jax.tree.leaves(g)[0]
        return z + 1e-12 * jnp.mean(leaf)

    chain_time("D fwd", lambda z: z + 1e-12 * jnp.mean(disc.apply(state.params_d, z)), x)
    chain_time("D fwd+bwd(params)", d_fwd_bwd, x)

    chain_time("augment fwd", lambda z: augment(z, 0.5, jax.random.key(0)), x)

    def aug_bwd(z):
        return jax.grad(lambda b: jnp.sum(augment(b, 0.5, jax.random.key(0))))(z)

    chain_time("augment fwd+bwd(input)", aug_bwd, x)

    buf = init_buffer(100, (SIZE, SIZE, 1))
    chain_time(
        "image buffer", lambda z: buffer_apply(buf, z, jax.random.key(0))[0], x
    )
    chain_time("instance_norm @64^2x256", instance_norm, feat)
    chain_time("up+down sample @64^2x256", lambda z: downsample2x(upsample2x(z)), feat)


if __name__ == "__main__":
    main()
