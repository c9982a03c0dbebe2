"""Pallas TPU kernel for the ADA affine warp (single-channel images).

Rebuilds the tent-weight contraction of ``augment.pipeline.warp_bilinear``
(reference contract: the pytorch-ada geometric warp, train.py:175-188)
entirely in VMEM. The XLA formulation writes the per-image
``[chunk, W, H']`` tent intermediate to HBM and reads it back for the
outer reduce (~11 ms/step of pure HBM traffic at 256^2/batch 16, the
largest non-conv cost in the step trace). Here the whole input image
(128 KB at 256^2 bf16) sits in VMEM; per grid cell the kernel

    1. builds the x-axis tent rows  wx[m, p]   (VPU, on the fly),
    2. contracts them with the image on the MXU: g[m, y'],
    3. builds wy[m, y'] and multiply-reduces on the VPU: out[m],

with m = CHUNK output rows x W columns, never materializing g in HBM.

The backward (cotangent w.r.t. IMAGES only — the transform matrices come
from the augmentation RNG and are never trained) is the transposed
contraction, accumulated over row chunks into a VMEM scratch:

    dimg[y', p] = sum_m wy[m, y'] * dout[m] * wx[m, p]

Numerics match the XLA path to activation-dtype rounding: tent weights
are computed in float32 (pixel coordinates up to H do not fit bf16), the
MXU contractions accumulate in float32, and the result is cast to the
image dtype. The antialias mode reproduces the pipeline's extended-range
normalization exactly (sum over taps in [-r, W+r), then the in-frame
slice).

Exercised vs the XLA formulation in tests/test_pallas_kernels.py
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_AA_MAX_WIDTH = 4.0  # must match augment.pipeline._AA_MAX_WIDTH


def _tent(
    coords: jax.Array,  # [CHUNK, W] float32 source coordinates
    n_taps: int,  # number of in-frame taps (W or H)
    r: int,  # extension radius (0 when not antialiasing)
    width: jax.Array,  # scalar float32 kernel width
    antialias: bool,
) -> jax.Array:
    """[CHUNK, W, n_taps] tent weights, extended-range-normalized when
    antialiasing (exactly pipeline.warp_bilinear's ``kernel``)."""
    if antialias:
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (*coords.shape, n_taps + 2 * r), 2
        ).astype(jnp.float32) - float(r)  # Mosaic requires integer iota
        k = jax.nn.relu(1.0 - jnp.abs((coords[..., None] - idx) / width))
        k = k / jnp.maximum(jnp.sum(k, axis=-1, keepdims=True), 1e-8)
        return k[..., r : r + n_taps]
    idx = jax.lax.broadcasted_iota(jnp.int32, (*coords.shape, n_taps), 2).astype(
        jnp.float32
    )
    return jax.nn.relu(1.0 - jnp.abs(coords[..., None] - idx))


def _fwd_kernel(
    wx_ref, wy_ref, sx_ref, sy_ref, img_ref, out_ref, *, antialias: bool, r: int
):
    # wx_ref/wy_ref: scalar-prefetched [B] width arrays in SMEM. Grid is
    # (batch, row-chunks, column-chunks); the tent tap dimensions always
    # span the FULL input (dense contraction), only the output tile splits.
    i = pl.program_id(0)
    chunk, wblk = sx_ref.shape[1], sx_ref.shape[2]
    h, w = img_ref.shape[1], img_ref.shape[2]
    dtype = img_ref.dtype
    sx = sx_ref[0]  # [CHUNK, WBLK]
    sy = sy_ref[0]
    img = img_ref[0]  # [H, W]
    m = chunk * wblk
    wx = _tent(sx, w, r, wx_ref[i], antialias).reshape(m, w)
    wy = _tent(sy, h, r, wy_ref[i], antialias).reshape(m, h)
    # g[m, y'] = sum_p wx[m, p] img[y', p]   (MXU, f32 accumulation)
    g = jax.lax.dot_general(
        wx.astype(dtype),
        img,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = jnp.sum(g * wy, axis=1)  # [m]  (VPU)
    out_ref[0] = out.reshape(chunk, wblk).astype(dtype)


def _bwd_kernel(
    wx_ref, wy_ref, sx_ref, sy_ref, dout_ref, dimg_ref, acc_ref,
    *, antialias: bool, r: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)
    chunk, wblk = sx_ref.shape[1], sx_ref.shape[2]
    h, w = dimg_ref.shape[1], dimg_ref.shape[2]
    sx = sx_ref[0]
    sy = sy_ref[0]
    dout = dout_ref[0].astype(jnp.float32)  # [CHUNK, WBLK]
    m = chunk * wblk
    wx = _tent(sx, w, r, wx_ref[i], antialias).reshape(m, w)
    # Fold dout into wy at 3D (a lane-preserving broadcast — Mosaic rejects
    # the [CHUNK, W] -> [CHUNK*W, 1] lane->sublane reshape), then collapse.
    a = (_tent(sy, h, r, wy_ref[i], antialias) * dout[..., None]).reshape(m, h)

    @pl.when(jnp.logical_and(j == 0, kk == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dimg[y', p] = sum_m (wy[m, y'] * dout[m]) * wx[m, p]   (MXU); every
    # output tile contributes to the whole [H, W] accumulator (dense taps).
    acc_ref[:] += jax.lax.dot_general(
        a, wx, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(
        jnp.logical_and(
            j == pl.num_programs(1) - 1, kk == pl.num_programs(2) - 1
        )
    )
    def _():
        dimg_ref[0] = acc_ref[:].astype(dimg_ref.dtype)


def _tiles_for(h: int, w: int) -> tuple[int, int]:
    """(row-chunk, column-block): 8 rows (Mosaic sublane minimum) x up to
    256 columns — the [CHUNK*WBLK, taps] tent blocks stay within VMEM for
    images up to 512 wide (column tiling splits only the OUTPUT; the tap
    dimensions always span the full input)."""
    return 8, min(w, 256)


def _coord_specs(chunk, wblk):
    return [
        pl.BlockSpec((1, chunk, wblk), lambda i, j, kk, *_: (i, j, kk)),  # sx
        pl.BlockSpec((1, chunk, wblk), lambda i, j, kk, *_: (i, j, kk)),  # sy
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def warp_pallas(images, sx, sy, width_x, width_y, antialias: bool = False):
    """Pallas affine warp of [B,H,W] single-channel images.

    ``sx``/``sy`` [B,H,W]: per-output-pixel source coordinates;
    ``width_x``/``width_y`` [B]: per-image tent widths (1 = exact
    bilinear). Differentiable in ``images`` ONLY — the coordinate inputs
    derive from the augmentation RNG and carry zero cotangent by
    construction (asserted by the caller, pipeline.warp_bilinear).
    """
    return _warp_fwd_impl(images, sx, sy, width_x, width_y, antialias)


def _warp_fwd_impl(images, sx, sy, width_x, width_y, antialias):
    b, h, w = images.shape
    chunk, wblk = _tiles_for(h, w)
    r = 2 * int(_AA_MAX_WIDTH) if antialias else 0
    kernel = functools.partial(_fwd_kernel, antialias=antialias, r=r)
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # width_x, width_y -> SMEM, indexed by b
        grid=(b, h // chunk, w // wblk),
        in_specs=[
            *_coord_specs(chunk, wblk),
            pl.BlockSpec((1, h, w), lambda i, j, kk, *_: (i, 0, 0)),  # img
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, wblk), lambda i, j, kk, *_: (i, j, kk)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), images.dtype),
        interpret=interpret,
    )(width_x, width_y, sx, sy, images)


def _warp_fwd(images, sx, sy, width_x, width_y, antialias):
    out = _warp_fwd_impl(images, sx, sy, width_x, width_y, antialias)
    return out, (sx, sy, width_x, width_y)


def _warp_bwd(antialias, res, dout):
    sx, sy, width_x, width_y = res
    b, h, w = dout.shape
    chunk, wblk = _tiles_for(h, w)
    r = 2 * int(_AA_MAX_WIDTH) if antialias else 0
    kernel = functools.partial(_bwd_kernel, antialias=antialias, r=r)
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h // chunk, w // wblk),
        in_specs=[
            *_coord_specs(chunk, wblk),
            pl.BlockSpec(
                (1, chunk, wblk), lambda i, j, kk, *_: (i, j, kk)
            ),  # dout
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, j, kk, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
    )
    dimg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), dout.dtype),
        interpret=interpret,
    )(width_x, width_y, sx, sy, dout)
    # Coordinates/widths come from the augmentation RNG: zero cotangents.
    return (
        dimg,
        jnp.zeros_like(sx),
        jnp.zeros_like(sy),
        jnp.zeros_like(width_x),
        jnp.zeros_like(width_y),
    )


warp_pallas.defvjp(_warp_fwd, _warp_bwd)
