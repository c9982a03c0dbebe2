"""Fused instance-norm (+ optional ReLU) Pallas TPU kernel.

InstanceNorm appears ~10x per generator pass and 3x per discriminator
pass (reference builder.py / blocks.py); it is bandwidth-bound. The XLA
lowering runs separate reduce + normalize passes over HBM; this kernel
does ONE read and ONE write per image: grid over (batch, channel-blocks),
the [H, W, C_blk] block lives in VMEM, statistics reduce over (H, W) in
float32 on the VPU (channel lanes parallel), normalization and the
optional ReLU fuse into the write.

Numerics: biased variance via E[x^2] - E[x]^2 with float32 accumulation,
eps inside rsqrt — matching ops/norm.py's bf16 fast path.

Forward-only and NOT wired into the model path: the models call
ops/norm.py's ``instance_norm`` (whose bf16 fast path XLA already fuses
to ~2 reads + 1 write). A custom-VJP integration was built and REJECTED
(round 2): Mosaic requires the block's lane dimension to be a multiple
of 128 or the full channel count, and the step's dominant IN shape
(256^2 x 64ch, 8.4 MB per bf16 block) cannot hold full channels in VMEM
for in+out+double-buffering — while any H/W split breaks the one-pass
(H,W) statistics and degenerates to XLA's own two-pass schedule. The
would-be win was ~1-2% of the step; not reachable on v5e tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _in_kernel(x_ref, o_ref, *, eps: float, relu: bool):
    x = x_ref[0]  # [H, W, C_blk]
    xf = x.astype(jnp.float32)
    inv_n = 1.0 / (x.shape[0] * x.shape[1])
    mean = jnp.sum(xf, axis=(0, 1), keepdims=True) * inv_n  # [1,1,C]
    sq = jnp.sum(xf * xf, axis=(0, 1), keepdims=True) * inv_n
    var = jnp.maximum(sq - mean * mean, 0.0)
    scale = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * scale
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_c_block(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest channel block (multiple of the lane width if possible) whose
    [H, W, C_blk] tile fits comfortably in VMEM."""
    budget = 6 * 1024 * 1024  # leave headroom of the ~16MB VMEM
    blk = c
    while blk > 1 and h * w * blk * itemsize > budget:
        # halve while keeping divisibility
        for cand in range(blk // 2, 0, -1):
            if c % cand == 0:
                blk = cand
                break
        else:
            blk = 1
    return blk


@functools.partial(jax.jit, static_argnames=("eps", "relu", "interpret"))
def _instance_norm_pallas(
    x: jax.Array, eps: float, relu: bool, interpret: bool
) -> jax.Array:
    b, h, w, c = x.shape
    c_blk = _pick_c_block(h, w, c, x.dtype.itemsize)
    grid = (b, c // c_blk)
    return pl.pallas_call(
        functools.partial(_in_kernel, eps=eps, relu=relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, c_blk),
                lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c_blk), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)


def instance_norm_pallas(
    x: jax.Array, eps: float = 1e-5, *, interpret: bool = False
) -> jax.Array:
    """Fused one-pass instance norm (NHWC)."""
    return _instance_norm_pallas(x, eps, False, interpret)


def instance_norm_relu_pallas(
    x: jax.Array, eps: float = 1e-5, *, interpret: bool = False
) -> jax.Array:
    """Fused one-pass instance norm + ReLU (NHWC)."""
    return _instance_norm_pallas(x, eps, True, interpret)
