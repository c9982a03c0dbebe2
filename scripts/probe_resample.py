"""Probe alternative formulations of the 2x anti-aliased resample ops.

The round-2 step trace attributes 54 ms/step (15.6%) to the depthwise FIR
resample convs (resample.py:74) running at ~7 TF/s / 428 GB/s on the VPU.
Candidate: banded interpolation-matrix matmuls on the MXU (which is idle
during those VPU ops) — out = U_h @ x @ U_w^T per channel, with the blur
folded into the matrix. Same math, different engine.

Measures fwd and fwd+bwd at the model's actual shapes via chained
iterations inside one jit (the tunnel's ~30 ms RTT floor forbids per-call
timing; see CLAUDE.md).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from one_to_many_gan_tpu.ops.resample import downsample2x, upsample2x


def _edge_pad_rows(eye: np.ndarray) -> np.ndarray:
    return np.concatenate([eye[:1], eye, eye[-1:]], axis=0)


def down_matrix(h: int) -> np.ndarray:
    """[h//2, h] matrix == _blur_halve_axis (edge pad + [1,3,3,1]/8 @ s2)."""
    pad = _edge_pad_rows(np.eye(h, dtype=np.float64))
    k = np.array([1.0, 3.0, 3.0, 1.0]) / 8.0
    return np.stack([k @ pad[2 * o : 2 * o + 4] for o in range(h // 2)]).astype(
        np.float32
    )


def up_matrix(h: int) -> np.ndarray:
    """[2h, h] matrix == _double_blur_axis (edge pad + dilated 6-tap)."""
    pad = _edge_pad_rows(np.eye(h, dtype=np.float64))  # [h+2, h]
    dil = np.zeros((2 * (h + 2) - 1, h))
    dil[::2] = pad
    dil = np.concatenate(
        [np.zeros((1, h)), dil, np.zeros((1, h))], axis=0
    )  # conv_pad (1,1)
    k = np.array([1.0, 5.0, 10.0, 10.0, 5.0, 1.0]) / 16.0
    return np.stack([k @ dil[o : o + 6] for o in range(dil.shape[0] - 5)]).astype(
        np.float32
    )


def up_mat_op(x):
    b, h, w, c = x.shape
    mh = jnp.asarray(up_matrix(h), x.dtype)
    mw = jnp.asarray(up_matrix(w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, y)


def down_mat_op(x):
    b, h, w, c = x.shape
    mh = jnp.asarray(down_matrix(h), x.dtype)
    mw = jnp.asarray(down_matrix(w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, y)


def chain_time(label, fn, x, n=30):
    import time

    def body(z, _):
        y = fn(z)
        # feed a scalar back so iterations are data-dependent
        return z * (1.0 + 0e-30 * jnp.mean(y).astype(z.dtype)) + 0 * jnp.mean(
            y
        ).astype(z.dtype), None

    @jax.jit
    def run(z):
        z, _ = jax.lax.scan(body, z, None, length=n)
        return jnp.mean(z)

    float(run(x))  # compile+warm
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:44s} {dt:8.3f} ms")
    return dt


def chain_time_grad(label, fn, x, n=30):
    g = jax.grad(lambda z: jnp.sum(fn(z).astype(jnp.float32) ** 2))
    return chain_time(label, lambda z: g(z).astype(z.dtype), x, n)


def main():
    rng = np.random.default_rng(0)
    print("bf16, chained x30; correctness max|diff| vs FIR path printed first")
    for b, h, c, kind in [
        (32, 256, 64, "down"),   # D phase: 2B at 256^2, 64ch
        (48, 256, 128, "down"),  # G encode at 3B... (enc1 out)
        (48, 128, 256, "down"),
        (48, 64, 256, "up"),     # decoder
        (48, 128, 128, "up"),
        (32, 128, 128, "down"),  # D trunk
        (32, 64, 256, "down"),
    ]:
        x = jnp.asarray(
            rng.standard_normal((b, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        fir = upsample2x if kind == "up" else downsample2x
        mat = up_mat_op if kind == "up" else down_mat_op
        d = float(
            jnp.max(
                jnp.abs(
                    fir(x).astype(jnp.float32) - mat(x).astype(jnp.float32)
                )
            )
        )
        print(f"[{kind} {b}x{h}^2x{c}]  maxdiff {d:.2e}")
        t1 = chain_time("FIR conv fwd", fir, x)
        t2 = chain_time("matrix fwd", mat, x)
        t3 = chain_time_grad("FIR conv fwd+bwd", fir, x)
        t4 = chain_time_grad("matrix fwd+bwd", mat, x)
        print(
            f"  -> fwd speedup {t1 / t2:4.2f}x   fwd+bwd speedup {t3 / t4:4.2f}x"
        )


if __name__ == "__main__":
    main()
