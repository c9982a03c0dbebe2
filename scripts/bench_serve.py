"""End-to-end latency of the persistent inference server (serve.py).

Measures what a deployment client actually sees — HTTP round-trip +
image decode + bucketed 1->N device sweep + PNG/zip (or npy) encode —
against a live server on localhost with fresh weights at the 256²
production architecture (the same model shape as scripts/bench_latency.py,
whose numbers isolate the bare XLA call). Prints one JSON line per
(n, format) point.

Also measures the dynamic-batching win: 4 concurrent clients against a
batching server (max_batch=4: the burst coalesces into ONE device call)
vs a serializing server (max_batch=1: four back-to-back device calls),
same engine and compiled programs — the req/s ratio is the coalescing
speedup a concurrent deployment sees.

Usage: python scripts/bench_serve.py [size]  (TPU; buckets warm before
timing; default 256, 512 measures the flagship resolution)
"""

import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from one_to_many_gan_tpu.core.state import Models, init_train_state  # noqa: E402
from one_to_many_gan_tpu.presets import tiny_config  # noqa: E402
from one_to_many_gan_tpu.serve import InferenceEngine, make_server  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = tiny_config(
        (size, size), 4, min_latent=64, tpu={"precision": "bfloat16"}
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    engine = InferenceEngine(config, buckets=(8, 64), state=state)
    warm_s = engine.warmup()
    print(
        f"# warmup (all n x batch bucket compiles): {warm_s:.1f}s",
        file=sys.stderr,
    )

    httpd = make_server(engine, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (size, size), dtype=np.uint8)
    ).save(buf, format="PNG")
    src = buf.getvalue()

    for n, fmt in ((8, "zip"), (8, "npy"), (64, "zip"), (64, "npy")):
        url = f"{base}/generate?n={n}&format={fmt}"
        # warm this exact route once (bucket already compiled)
        urllib.request.urlopen(
            urllib.request.Request(url + "&seed=0", data=src), timeout=120
        ).read()
        times = []
        for i in range(9):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(url + f"&seed={i}", data=src), timeout=120
            ).read()
            times.append((time.perf_counter() - t0) * 1000)
        p50 = sorted(times)[len(times) // 2]
        print(
            json.dumps(
                {
                    "metric": f"serve_one_to_{n}_{fmt}_p50_latency_{size}x{size}",
                    "value": round(p50, 2),
                    "unit": "ms",
                }
            )
        )
    httpd.shutdown()
    if httpd.batcher is not None:
        httpd.batcher.close()

    # ---- dynamic-batching win: 4 concurrent clients, batched vs serial ----
    conc, rounds = 4, 6
    zero = np.zeros((size, size, 1), np.uint8)
    for bb in engine.batch_buckets:  # partial bursts must not compile mid-timing
        engine.generate_batch([zero] * bb, [8] * bb, [0] * bb, [1.0] * bb)
    results = {}
    for label, max_batch in (("batched", conc), ("serial", 1)):
        httpd = make_server(
            engine, host="127.0.0.1", port=0, max_batch=max_batch
        )
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        url = f"{base}/generate?n=8&format=npy"

        barrier = threading.Barrier(conc + 1)

        def client(cid, url=url, barrier=barrier):
            barrier.wait(timeout=120)
            for i in range(rounds):
                urllib.request.urlopen(
                    urllib.request.Request(f"{url}&seed={cid * 100 + i}",
                                           data=src),
                    timeout=300,
                ).read()

        threads = [
            threading.Thread(target=client, args=(c,)) for c in range(conc)
        ]
        for t in threads:
            t.start()
        barrier.wait(timeout=120)  # release the burst, then time to drain
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        results[label] = conc * rounds / wall
        print(
            json.dumps(
                {
                    "metric": f"serve_concurrent{conc}_{label}_{size}x{size}",
                    "value": round(results[label], 2),
                    "unit": "req/s",
                }
            )
        )
        httpd.shutdown()
        if httpd.batcher is not None:
            httpd.batcher.close()
    print(
        json.dumps(
            {
                "metric": f"serve_batching_speedup_{size}x{size}",
                "value": round(results["batched"] / results["serial"], 3),
                "unit": "x",
            }
        )
    )


if __name__ == "__main__":
    main()
