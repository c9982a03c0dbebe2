"""p50 latency of the batched 1->N inference sweep (BASELINE.json metric 3).

One source image x N latents decoded in a single XLA call. Prints a
JSON line per N. Usage: python scripts/bench_latency.py [size]
(default 256; 512 measures the flagship-config resolution).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from one_to_many_gan_tpu.core.state import (  # noqa: E402
    Models,
    eval_params_g,
    init_train_state,
)
from one_to_many_gan_tpu.core.train_step import make_inference_fns  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = tiny_config((size, size), 4, min_latent=64,
                         tpu={"precision": "bfloat16"})
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    _, one_to_many, _ = make_inference_fns(config, models)
    fn = jax.jit(one_to_many, static_argnums=4)
    params_g = eval_params_g(state)  # EMA weights when enabled

    img = jax.device_put(
        np.random.default_rng(0).standard_normal((size, size, 1)).astype(np.float32)
    )
    for n in (8, 64):
        # warm
        np.asarray(fn(params_g, state.params_m, img, jax.random.key(0), n))
        times = []
        for i in range(9):
            t0 = time.perf_counter()
            out = np.asarray(
                fn(params_g, state.params_m, img, jax.random.key(i), n)
            )
            times.append((time.perf_counter() - t0) * 1000)
        p50 = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": f"one_to_{n}_sweep_p50_latency_{size}x{size}",
            "value": round(p50, 2),
            "unit": "ms",
        }))


if __name__ == "__main__":
    main()
