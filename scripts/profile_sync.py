"""Synchronous per-call timing (block every call) to validate async numbers."""

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
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402

BATCH = 8
SIZE = 256


def bench_sync(name, fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    print(f"{name:40s} min {min(times):8.2f} ms  median {sorted(times)[len(times)//2]:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 1)).astype(np.float32))

    config = tiny_config((SIZE, SIZE), BATCH, min_latent=64)
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    gen = models.generator
    n_blocks, w_dim = models.n_style_blocks, models.w_dim
    w = jnp.asarray(rng.standard_normal((n_blocks, BATCH, w_dim)).astype(np.float32))

    bench_sync("G full fwd", jax.jit(lambda p, a, ww: gen.apply(p, a, ww)),
               state.params_g, x, w)

    def g_fwd_bwd(p, a, ww):
        return jax.grad(
            lambda pp: jnp.sum(gen.apply(pp, a, ww).astype(jnp.float32))
        )(p)

    bench_sync("G full fwd+bwd", jax.jit(g_fwd_bwd), state.params_g, x, w)
    bench_sync("augment fwd", jax.jit(lambda a: augment(a, 0.5, jax.random.key(0))), x)


if __name__ == "__main__":
    main()
