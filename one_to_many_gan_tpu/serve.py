"""Persistent 1->N inference server (deployment-facing serving path).

The reference exposes 1->N sampling only implicitly inside
``image_checkpoint`` (reference src/core/evaluation.py:171-177, the
``.expand(8, ...)`` decode) and has no serving story; ``generate.py``
covers the one-shot CLI. This module is the long-lived counterpart for
production: load the latest checkpoint ONCE (the EMA generator when
``tpu.ema_decay > 0``), pre-compile the batched 1->N sweep at a fixed
set of N buckets, and answer HTTP requests with every XLA program warm —
so steady-state request latency is the device decode plus PNG encode,
never a compile.

TPU-first serving shape: one encode + one batched decode per request
(a single XLA call, styles batched on the device), N rounded UP to the
nearest compiled bucket and the output sliced on the host. Any
``n <= max(buckets)`` therefore hits a cached executable; the bucket
set bounds total compiles at startup. Requests are served sequentially
on the single device — throughput comes from style batching inside the
call, not from request threads racing for the chip.

API (stdlib ``http.server``; no new dependencies):

- ``GET /healthz`` -> ``{"status": "ok", "step": N, "ema": bool, ...}``
- ``GET /stats``   -> request count + latency percentiles (ms)
- ``POST /generate?n=8&seed=0&theta=1.0`` with a PNG/JPEG body ->
  ``application/zip`` of ``n`` PNG shoemarks (``shoemark_0000.png``...)
- ``POST /generate?...&format=npy`` -> one ``[n, H, W, C]`` uint8
  ``.npy`` payload (cheaper than n PNG encodes for bulk consumers)
- ``POST /reload`` -> re-restore the latest checkpoint of the configured
  run (serve alongside an ongoing training run without restarting; the
  compiled programs are weight-agnostic, so no recompile)

CLI:
    python -m one_to_many_gan_tpu.serve config.toml \
        [--host 0.0.0.0] [--port 8000] [--buckets 8,32,64]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _decode_image_bytes(data: bytes, image_size, channels: int) -> np.ndarray:
    """PNG/JPEG bytes -> [H, W, C] uint8, same convert/resize contract as
    the dataset loader (data/datasets.py:_load_image)."""
    from PIL import Image

    h, w = image_size
    try:
        img = Image.open(io.BytesIO(data))
    except Exception as exc:  # undecodable body is a CLIENT error (400)
        msg = f"request body is not a decodable image: {exc}"
        raise ValueError(msg) from exc
    img = img.convert("L" if channels == 1 else "RGB")
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _encode_png(arr_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    img = arr_u8.squeeze(-1) if arr_u8.shape[-1] == 1 else arr_u8
    # compress_level=1: the serving host is single-core and PNG encode
    # dominates the zip route's latency (measured in BASELINE.md); level 1
    # halves encode time for a modest size increase vs PIL's default 6
    Image.fromarray(img).save(buf, format="PNG", compress_level=1)
    return buf.getvalue()


class InferenceEngine:
    """Checkpoint-backed 1->N sampler with per-bucket compiled programs.

    Args:
        config: full framework config (``load_config`` / ``tiny_config``).
        buckets: ascending N values to pre-compile; a request's ``n`` is
            rounded up to the first bucket >= n (hard cap = max bucket).
        state: optional pre-built TrainState (tests inject fresh weights);
            when None the latest Orbax checkpoint of the configured run is
            restored.
        artifact: optional path to an inference artifact written by
            ``export.py`` (EMA generator + mapping only); mutually
            exclusive with ``state``, and /reload is unavailable (the
            artifact is immutable).
    """

    def __init__(self, config, buckets=(8, 32, 64), state=None, artifact=None):
        import jax

        from one_to_many_gan_tpu.core.state import Models, init_train_state
        from one_to_many_gan_tpu.core.train_step import make_inference_fns

        if not buckets or list(buckets) != sorted(set(buckets)):
            msg = f"buckets must be ascending and unique, got {buckets!r}"
            raise ValueError(msg)
        if state is not None and artifact is not None:
            msg = "state and artifact are mutually exclusive"
            raise ValueError(msg)
        self.config = config
        self.buckets = tuple(int(b) for b in buckets)
        models = Models(config)
        self._mgr = None
        # one request on the device at a time; HTTP layer may be threaded
        self._lock = threading.Lock()
        if artifact is not None:
            from one_to_many_gan_tpu.export import load_inference_artifact

            self._params_g, self._params_m, self.step, self.ema = (
                load_inference_artifact(artifact)
            )
            self._template = None
        elif state is None:
            state = init_train_state(config, models, jax.random.key(0))
            state, self.step = self._restore_latest(state)
            self._install(state)
        else:
            self.step = int(state.step)
            self._install(state)
        _, one_to_many = make_inference_fns(config, models)
        self._fn = jax.jit(one_to_many, static_argnums=4)
        self._jax = jax
        self.image_size = tuple(config["data"]["image_size"])
        self.channels = config["data"]["image_channels"]

    def _install(self, state) -> None:
        from one_to_many_gan_tpu.core.state import eval_params_g

        self._template = state  # abstract shapes for future restores
        self.ema = state.ema_params_g is not None
        self._params_g = eval_params_g(state)
        self._params_m = state.params_m

    def _restore_latest(self, template):
        from one_to_many_gan_tpu.core.trainer import (
            _checkpoint_manager,
            restore_checkpoint,
        )

        if self._mgr is None:
            self._mgr = _checkpoint_manager(self.config)
        self._mgr.reload()  # pick up steps saved by another process
        return restore_checkpoint(self._mgr, template)

    def reload(self) -> int:
        """Re-restore the latest checkpoint of the configured run.

        Lets a long-lived server track an ONGOING training run: the
        compiled programs are weight-agnostic, so swapping parameters
        costs one restore, never a recompile. Returns the serving step
        (unchanged when no newer checkpoint exists).
        """
        if self._template is None:
            msg = "reload unavailable: engine is backed by an immutable artifact"
            raise ValueError(msg)
        state, step = self._restore_latest(self._template)
        if step and step != self.step:
            with self._lock:
                self._install(state)
                self.step = step
        return self.step

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        msg = f"n={n} exceeds the largest compiled bucket {self.buckets[-1]}"
        raise ValueError(msg)

    def warmup(self) -> float:
        """Compile every bucket once (zeros input); returns seconds spent."""
        t0 = time.perf_counter()
        zero = np.zeros((*self.image_size, self.channels), np.uint8)
        for b in self.buckets:
            self.generate(zero, b, seed=0, theta=1.0)
        return time.perf_counter() - t0

    def generate(
        self, image_u8: np.ndarray, n: int, seed: int = 0, theta: float = 1.0
    ) -> np.ndarray:
        """[H,W,C] uint8 source -> [n,H,W,C] uint8 shoemarks (one XLA call)."""
        from one_to_many_gan_tpu.data.pipeline import normalize_u8

        bucket = self.bucket_for(n)
        img = normalize_u8(image_u8[None])[0]
        with self._lock:
            outs = np.asarray(
                self._fn(
                    self._params_g,
                    self._params_m,
                    img,
                    self._jax.random.key(seed),
                    bucket,
                    theta,
                )
            )
        return np.clip((outs[:n] + 1.0) * 127.5, 0, 255).astype(np.uint8)


class _Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.latencies_ms: list[float] = []
        self.errors = 0

    def record(self, ms: float):
        with self.lock:
            self.latencies_ms.append(ms)
            # bounded memory for long-lived servers
            if len(self.latencies_ms) > 10_000:
                del self.latencies_ms[:5_000]

    def error(self):
        with self.lock:
            self.errors += 1

    def snapshot(self) -> dict:
        with self.lock:
            lat = np.asarray(self.latencies_ms, np.float64)
            out = {"requests": int(lat.size), "errors": self.errors}
            if lat.size:
                out["latency_ms"] = {
                    "p50": round(float(np.percentile(lat, 50)), 2),
                    "p95": round(float(np.percentile(lat, 95)), 2),
                    "max": round(float(lat.max()), 2),
                }
            return out


def make_handler(engine: InferenceEngine, stats: _Stats):
    """Build the request-handler class bound to one engine instance."""

    class Handler(BaseHTTPRequestHandler):
        # quiet the default per-request stderr lines
        def log_message(self, fmt, *args):  # noqa: ARG002
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(
                    200,
                    {
                        "status": "ok",
                        "step": engine.step,
                        "ema": engine.ema,
                        "buckets": list(engine.buckets),
                        "image_size": list(engine.image_size),
                    },
                )
            elif path == "/stats":
                self._json(200, stats.snapshot())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path == "/reload":
                try:
                    step = engine.reload()
                except ValueError as exc:  # artifact-backed engine
                    stats.error()
                    self._json(400, {"error": str(exc)})
                    return
                except Exception as exc:  # noqa: BLE001
                    stats.error()
                    self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
                    return
                self._json(200, {"status": "ok", "step": step})
                return
            if url.path != "/generate":
                self._json(404, {"error": f"unknown path {url.path}"})
                return
            t0 = time.perf_counter()
            try:
                q = parse_qs(url.query)
                n = int(q.get("n", ["8"])[0])
                seed = int(q.get("seed", ["0"])[0])
                theta = float(q.get("theta", ["1.0"])[0])
                fmt = q.get("format", ["zip"])[0]
                if n < 1:
                    raise ValueError(f"n must be >= 1, got {n}")
                length = int(self.headers.get("Content-Length", "0"))
                if length <= 0:
                    raise ValueError("request body (source image) required")
                if length > 64 * 1024 * 1024:
                    raise ValueError("request body exceeds 64MB limit")
                src = _decode_image_bytes(
                    self.rfile.read(length), engine.image_size, engine.channels
                )
                outs = engine.generate(src, n, seed=seed, theta=theta)
            except ValueError as exc:
                stats.error()
                self._json(400, {"error": str(exc)})
                return
            except Exception as exc:  # noqa: BLE001 — surface, don't kill server
                stats.error()
                self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
                return

            if fmt == "npy":
                buf = io.BytesIO()
                np.save(buf, outs)
                body, ctype = buf.getvalue(), "application/octet-stream"
            else:
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                    for i, arr in enumerate(outs):
                        zf.writestr(f"shoemark_{i:04d}.png", _encode_png(arr))
                body, ctype = buf.getvalue(), "application/zip"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            stats.record((time.perf_counter() - t0) * 1e3)

    return Handler


def make_server(
    engine: InferenceEngine, host="0.0.0.0", port=8000
) -> ThreadingHTTPServer:
    """Threaded HTTP server. Device work still serializes on the engine
    lock (one chip), but threading lets cheap requests (/healthz, /stats)
    and the host-side encode/decode of concurrent clients overlap the
    device call instead of queueing behind it; ``_Stats`` takes its own
    lock for every mutation, so the counters survive the races."""
    return ThreadingHTTPServer((host, port), make_handler(engine, _Stats()))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="8,32,64")
    ap.add_argument(
        "--artifact",
        default=None,
        help="serve from an export.py inference artifact instead of the "
        "latest Orbax checkpoint (immutable: /reload disabled)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from one_to_many_gan_tpu.config import load_config

    config = load_config(args.config)
    engine = InferenceEngine(
        config,
        buckets=[int(b) for b in args.buckets.split(",")],
        artifact=args.artifact,
    )
    print(
        f"restored step {engine.step} ({'EMA' if engine.ema else 'raw'} generator); "
        f"warming {len(engine.buckets)} buckets..."
    )
    warm_s = engine.warmup()
    print(f"warm in {warm_s:.1f}s; serving on {args.host}:{args.port}")
    make_server(engine, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
