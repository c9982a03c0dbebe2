"""Component-level timing on the current default device.

Times each building block in isolation (forward and, where relevant,
fwd+bwd) to attribute fused-step cost. Uses the persistent compilation
cache so reruns are cheap.
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

from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402
from one_to_many_gan_tpu.augment import augment  # noqa: E402
from one_to_many_gan_tpu.core.buffer import buffer_apply, init_buffer  # noqa: E402
from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.ops import downsample2x, instance_norm, upsample2x  # noqa: E402

BATCH = 8
SIZE = 256
REPS = 10


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:45s} {dt:8.2f} ms")
    return dt


def main():
    print(f"device: {jax.devices()[0]}, batch {BATCH}, {SIZE}x{SIZE}")
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
    w = jnp.zeros((n_blocks, BATCH, w_dim))

    # no-op dispatch overhead
    tiny = jnp.ones((8, 128))
    bench("dispatch overhead (tiny add)", jax.jit(lambda a: a + 1.0), tiny)

    bench("G encode fwd", jax.jit(lambda p, a: gen.apply(p, a, method="encode")),
          state.params_g, x)
    bench("G decode fwd", jax.jit(lambda p, z, ww: gen.apply(p, z, ww, method="decode")),
          state.params_g, feat, w)
    bench("D fwd", jax.jit(lambda p, a: disc.apply(p, a)), state.params_d, x)

    def g_fwd_bwd(p, a, ww):
        return jax.grad(
            lambda pp: jnp.sum(gen.apply(pp, a, ww).astype(jnp.float32))
        )(p)

    bench("G full fwd+bwd", jax.jit(lambda p, a, ww: jax.tree.leaves(
        g_fwd_bwd(p, a, ww))[0]), state.params_g, x, w)

    bench("augment fwd", jax.jit(lambda a: augment(a, 0.5, jax.random.key(0))), x)

    def aug_bwd(a):
        return jax.grad(lambda b: jnp.sum(augment(b, 0.5, jax.random.key(0))))(a)

    bench("augment fwd+bwd", jax.jit(aug_bwd), x)

    buf = init_buffer(100, (SIZE, SIZE, 1))
    bench("image buffer", jax.jit(lambda b, f: buffer_apply(b, f, jax.random.key(0))[0]),
          buf, x)

    bench("instance_norm", jax.jit(instance_norm), feat)
    bench("upsample2x", jax.jit(upsample2x), feat)
    bench("downsample2x", jax.jit(downsample2x), feat)


if __name__ == "__main__":
    main()
