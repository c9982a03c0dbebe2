"""Micro-benchmarks (chained) for bf16 conv efficiency and model sub-parts."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.ops import instance_norm, upsample2x  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402

B = 16
N = 20


def chain_time(name, fn, x0, n=N, flops=None):
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
    extra = f"  {flops / (ms / 1e3) / 1e12:7.1f} TFLOPs" if flops else ""
    print(f"{name:44s} {ms:8.2f} ms/iter{extra}")


def main():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(
        rng.standard_normal((B, 64, 64, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    kconv = jnp.asarray(
        rng.standard_normal((3, 3, 256, 256)).astype(np.float32) * 0.01,
        dtype=jnp.bfloat16,
    )
    conv_flops = 2 * 9 * 256 * 256 * 64 * 64 * B

    def conv(z):
        return jax.lax.conv_general_dilated(
            z, kconv, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    chain_time("conv3x3 256ch @64^2 bf16", conv, feat, flops=conv_flops)

    big = jnp.asarray(
        rng.standard_normal((B, 256, 256, 64)).astype(np.float32), dtype=jnp.bfloat16
    )
    kbig = jnp.asarray(
        rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.01,
        dtype=jnp.bfloat16,
    )
    chain_time(
        "conv3x3 64ch @256^2 bf16",
        lambda z: jax.lax.conv_general_dilated(
            z, kbig, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        big,
        flops=2 * 9 * 64 * 64 * 256 * 256 * B,
    )

    chain_time("instance_norm bf16 @256^2x64", instance_norm, big)
    chain_time("upsample2x bf16 @128^2x128",
               lambda z: z,  # placeholder replaced below
               big, n=1)

    up_in = jnp.asarray(
        rng.standard_normal((B, 128, 128, 128)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    kproj = jnp.asarray(
        rng.standard_normal((1, 1, 128, 128)).astype(np.float32) * 0.01,
        dtype=jnp.bfloat16,
    )

    def up_then_proj(z):
        y = upsample2x(z)  # [B,256,256,128]
        y = jax.lax.conv_general_dilated(
            y, kproj, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y  # back to [B,128,128,128]

    chain_time("upsample2x+1x1s2 bf16 @128->256", up_then_proj, up_in)

    config = tiny_config((256, 256), B, min_latent=64,
                         tpu={"precision": "bfloat16"})
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    gen = models.generator
    x = jnp.asarray(rng.standard_normal((B, 256, 256, 1)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((models.n_style_blocks, B, 6)).astype(np.float32)
    )

    def encode(z):
        lat = gen.apply(state.params_g, z, method="encode")
        return z + 1e-12 * jnp.mean(lat).astype(z.dtype)

    chain_time("G encode bf16", encode, x)

    lat0 = gen.apply(state.params_g, x, method="encode")

    def decode(z):
        img = gen.apply(state.params_g, z, w, method="decode")
        return z + 1e-12 * jnp.mean(img).astype(z.dtype)

    chain_time("G decode bf16", decode, lat0)


if __name__ == "__main__":
    main()
