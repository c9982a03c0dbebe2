"""int8 vs bf16 decode throughput (the serve.py --int8 lever) on TPU.

Per CLAUDE.md timing discipline: the axon tunnel's ~30ms round-trip floor
and missing block_until_ready sync make per-call timing useless, so each
variant chains K data-dependent translate() iterations (image -> image)
inside ONE jitted lax.scan and closes with a host read. Both variants run
in the same process/session, so the ratio is tunnel-robust even though
the absolutes drift between sessions.

Usage: python scripts/bench_int8.py [size] [batch] [iters]
Prints one JSON line per variant plus the ratio.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from one_to_many_gan_tpu.core.state import (  # noqa: E402
    Models,
    eval_params_g,
    init_train_state,
)
from one_to_many_gan_tpu.core.train_step import make_inference_fns  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402


def chained_translate(config, models, iters):
    """One jitted program: x -> translate^iters(x), data-dependent chain."""
    translate, _, _ = make_inference_fns(config, models)

    def run(params_g, params_m, x, rng):
        def body(carry, i):
            y = translate(params_g, params_m, carry, jax.random.fold_in(rng, i))
            return y.astype(jnp.float32), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(iters))
        return out

    return jax.jit(run)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    config = tiny_config((size, size), batch, min_latent=64,
                         tpu={"precision": "bfloat16"})
    f32_models = Models(config)
    state = init_train_state(config, f32_models, jax.random.key(0))
    params_g, params_m = eval_params_g(state), state.params_m
    x = jax.device_put(
        np.random.default_rng(0).standard_normal((batch, size, size, 1))
        .astype(np.float32)
    )

    results = {}
    for name, models in (
        ("bf16", f32_models),
        ("int8", Models(config, int8_decode=True)),
    ):
        fn = chained_translate(config, models, iters)
        # warm (compile)
        float(jnp.sum(fn(params_g, params_m, x, jax.random.key(0))))
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            s = float(jnp.sum(fn(params_g, params_m, x, jax.random.key(rep))))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(s)
        best = min(times)
        img_s = batch * iters / best
        results[name] = img_s
        print(json.dumps({
            "metric": f"translate_chain_{name}_{size}x{size}_b{batch}",
            "value": round(img_s, 2),
            "unit": "img/s",
        }))
    print(json.dumps({
        "metric": f"int8_speedup_{size}x{size}_b{batch}",
        "value": round(results["int8"] / results["bf16"], 3),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
