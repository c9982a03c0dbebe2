"""Attribute fused-step cost at the bf16 operating point via chained timing.

Chains each phase N times data-dependently in one program; measures the
full fused step the same way for cross-checking.
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
from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.core.train_step import Batches, make_train_step  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402

BATCH = 16
SIZE = 256
N = 10


def chain_time(name, fn, x0, n=N):
    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x.astype(jnp.float32))

    float(chained(x0))
    t0 = time.perf_counter()
    float(chained(x0))
    total = (time.perf_counter() - t0) * 1000
    print(f"{name:42s} {total / n:8.2f} ms/iter")


def main():
    print(f"bf16, batch {BATCH}, {SIZE}x{SIZE}, chain {N}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))

    config = tiny_config(
        (SIZE, SIZE), BATCH, min_latent=64, tpu={"precision": "bfloat16"}
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    gen, disc, ext = models.generator, models.discriminator, models.extractor
    n_blocks, w_dim = models.n_style_blocks, models.w_dim
    w = jnp.asarray(rng.standard_normal((n_blocks, BATCH, w_dim)).astype(np.float32))

    chain_time(
        "G fwd bf16",
        lambda z: gen.apply(state.params_g, z, w).astype(jnp.float32),
        x,
    )

    def g_fwd_bwd(z):
        g = jax.grad(
            lambda pp: jnp.sum(gen.apply(pp, z, w).astype(jnp.float32))
        )(state.params_g)
        return z + 1e-12 * jnp.mean(jax.tree.leaves(g)[0])

    chain_time("G fwd+bwd bf16", g_fwd_bwd, x)

    def d_fwd_bwd(z):
        g = jax.grad(
            lambda pp: jnp.sum(disc.apply(pp, z).astype(jnp.float32))
        )(state.params_d)
        return z + 1e-12 * jnp.mean(jax.tree.leaves(g)[0])

    chain_time("D fwd+bwd bf16", d_fwd_bwd, x)

    def e_fwd(z):
        return z + 1e-12 * jnp.mean(ext.apply(state.params_s, z))

    chain_time("StyleExtractor fwd bf16", e_fwd, x)
    chain_time("augment fwd", lambda z: augment(z, 0.5, jax.random.key(0)), x)

    def d_fwd_bwd_2b(z):
        z2 = jnp.concatenate([z, z], axis=0)
        g = jax.grad(
            lambda pp: jnp.sum(disc.apply(pp, z2).astype(jnp.float32))
        )(state.params_d)
        return z + 1e-12 * jnp.mean(jax.tree.leaves(g)[0])

    chain_time("D fwd+bwd bf16 @2B (fused fake+real)", d_fwd_bwd_2b, x)

    def g_fwd_bwd_3b(z):
        z3 = jnp.concatenate([z, z, z], axis=0)
        w3 = jnp.concatenate([w, w, w], axis=1)
        g = jax.grad(
            lambda pp: jnp.sum(gen.apply(pp, z3, w3).astype(jnp.float32))
        )(state.params_g)
        return z + 1e-12 * jnp.mean(jax.tree.leaves(g)[0])

    chain_time("G fwd+bwd bf16 @3B (fused-decode shape)", g_fwd_bwd_3b, x, n=5)

    # Full fused step: thread BOTH metrics and an updated-param scalar back
    # into the chain, else XLA dead-code-eliminates the whole backward +
    # optimizer half of the program (grads feed only the state update).
    step = make_train_step(config, models)

    def full_step(z):
        b = Batches(z, z, z, z)
        new_state, metrics = step(state, b, jax.random.key(0))
        touch = jax.tree.leaves(new_state.params_g)[0].ravel()[0]
        touch += jax.tree.leaves(new_state.params_d)[0].ravel()[0]
        touch += jax.tree.leaves(new_state.params_m)[0].ravel()[0]
        touch += jax.tree.leaves(new_state.params_s)[0].ravel()[0]
        touch += jax.tree.leaves(new_state.buffer)[0].ravel()[0].astype(jnp.float32)
        touch += new_state.ada.p
        return z + 1e-12 * (metrics["total_gen_loss"] + touch)

    chain_time("FULL fused step (fwd+bwd+opt)", full_step, x, n=5)


if __name__ == "__main__":
    main()
