"""Adaptive discriminator augmentation (ADA) pipeline, JAX/TPU-native.

The reference consumes this as the external ``pytorch-ada`` dependency
(reference train.py:12,175-188; pyproject.toml:27), a pure-torch port of
the published StyleGAN2-ADA augmentation pipeline. This module rebuilds
that contract from the published algorithm: 12 augmentation categories
(xflip, rotate90, xint, scale, rotate, aniso, xfrac, brightness, contrast,
lumaflip, hue, saturation), each applied per-sample with probability ``p``,
fully differentiable (the generator backpropagates through the
augmentation in its GAN loss, reference training.py:200-204).

TPU-native design: all geometric categories compose into ONE per-sample
3x3 homogeneous inverse affine, applied by a single batched bilinear warp
(two gathers + lerp — VPU work that XLA fuses); all color categories
compose into ONE per-sample 4x4 homogeneous color matrix applied as an
elementwise FMA. No per-category image passes, no host control flow, no
dynamic shapes. Parameter distributions follow the published defaults:
integer/fractional translation max 0.125, log2-normal scale/aniso std 0.2,
full-circle rotation, brightness std 0.2, contrast log2 std 0.5,
full-circle hue, saturation log2 std 1.0; the rotation probability is
split as 1 - sqrt(1-p) across the pre/post legs so the total matches p.

Grayscale (C==1) images: hue and saturation are no-ops (as in the
published pipeline) and the color matrix collapses to a scalar gain+bias
via the luma row-mean.

Out-of-range samples read as zero (grid_sample zero padding), keeping the
warp a pure gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ALL_CATEGORIES: tuple[str, ...] = (
    "xflip",
    "rotate90",
    "xint",
    "scale",
    "rotate",
    "aniso",
    "xfrac",
    "brightness",
    "contrast",
    "lumaflip",
    "hue",
    "saturation",
)

# Published default strengths.
XINT_MAX = 0.125
SCALE_STD = 0.2
ROTATE_MAX = 1.0
ANISO_STD = 0.2
XFRAC_STD = 0.125
BRIGHTNESS_STD = 0.2
CONTRAST_STD = 0.5
HUE_MAX = 1.0
SATURATION_STD = 1.0

# Host-side constant (a module-level DEVICE array would be committed to
# whatever backend is default at import and can poison later lowerings).
import numpy as _np

_LUMA = _np.asarray([1.0, 1.0, 1.0, 0.0], dtype=_np.float32) / _np.sqrt(3.0)


def _eye3(b: int) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))


def _eye4(b: int) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))


def _translate2d(tx: jax.Array, ty: jax.Array) -> jax.Array:
    b = tx.shape[0]
    m = _eye3(b)
    m = m.at[:, 0, 2].set(tx)
    return m.at[:, 1, 2].set(ty)


def _scale2d(sx: jax.Array, sy: jax.Array) -> jax.Array:
    b = sx.shape[0]
    m = _eye3(b)
    m = m.at[:, 0, 0].set(sx)
    return m.at[:, 1, 1].set(sy)


def _rotate2d(theta: jax.Array) -> jax.Array:
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye3(b)
    m = m.at[:, 0, 0].set(c)
    m = m.at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s)
    return m.at[:, 1, 1].set(c)


def _rotate3d_luma(theta: jax.Array) -> jax.Array:
    """4x4 rotation about the (1,1,1)/sqrt(3) axis (hue rotation)."""
    b = theta.shape[0]
    vx = vy = vz = 1.0 / jnp.sqrt(3.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    cc = 1.0 - c
    m = _eye4(b)
    m = m.at[:, 0, 0].set(vx * vx * cc + c)
    m = m.at[:, 0, 1].set(vx * vy * cc - vz * s)
    m = m.at[:, 0, 2].set(vx * vz * cc + vy * s)
    m = m.at[:, 1, 0].set(vy * vx * cc + vz * s)
    m = m.at[:, 1, 1].set(vy * vy * cc + c)
    m = m.at[:, 1, 2].set(vy * vz * cc - vx * s)
    m = m.at[:, 2, 0].set(vz * vx * cc - vy * s)
    m = m.at[:, 2, 1].set(vz * vy * cc + vx * s)
    m = m.at[:, 2, 2].set(vz * vz * cc + c)
    return m


def _where_mat(mask: jax.Array, mat: jax.Array, identity: jax.Array) -> jax.Array:
    return jnp.where(mask[:, None, None], mat, identity)


def geometric_matrix(
    rng: jax.Array,
    batch: int,
    height: int,
    width: int,
    p: jax.Array,
    categories: frozenset[str],
) -> jax.Array:
    """Compose the per-sample inverse geometric transform G_inv [B,3,3].

    G_inv maps output pixel coordinates (centered) to input coordinates.
    """
    keys = jax.random.split(rng, 16)
    g = _eye3(batch)

    def gate(key) -> jax.Array:
        return jax.random.uniform(key, (batch,)) < p

    if "xflip" in categories:
        i = jax.random.randint(keys[0], (batch,), 0, 2).astype(jnp.float32)
        i = jnp.where(gate(keys[1]), i, 0.0)
        g = g @ _scale2d(1.0 - 2.0 * i, jnp.ones((batch,)))
    if "rotate90" in categories:
        i = jax.random.randint(keys[2], (batch,), 0, 4).astype(jnp.float32)
        i = jnp.where(gate(keys[3]), i, 0.0)
        g = g @ _rotate2d(jnp.pi / 2.0 * i)
    if "xint" in categories:
        t = (jax.random.uniform(keys[4], (batch, 2)) * 2.0 - 1.0) * XINT_MAX
        t = jnp.where(gate(keys[5])[:, None], t, 0.0)
        g = g @ _translate2d(-jnp.round(t[:, 0] * width), -jnp.round(t[:, 1] * height))
    if "scale" in categories:
        s = jnp.exp2(jax.random.normal(keys[6], (batch,)) * SCALE_STD)
        s = jnp.where(gate(keys[7]), s, 1.0)
        g = g @ _scale2d(1.0 / s, 1.0 / s)
    p_rot = 1.0 - jnp.sqrt(jnp.maximum(1.0 - p, 0.0))
    if "rotate" in categories:
        theta = (jax.random.uniform(keys[8], (batch,)) * 2.0 - 1.0) * jnp.pi * ROTATE_MAX
        theta = jnp.where(jax.random.uniform(keys[9], (batch,)) < p_rot, theta, 0.0)
        g = g @ _rotate2d(theta)  # inverse of rotate(-theta) pre-leg
    if "aniso" in categories:
        s = jnp.exp2(jax.random.normal(keys[10], (batch,)) * ANISO_STD)
        s = jnp.where(gate(keys[11]), s, 1.0)
        g = g @ _scale2d(1.0 / s, s)
    if "rotate" in categories:
        theta = (jax.random.uniform(keys[12], (batch,)) * 2.0 - 1.0) * jnp.pi * ROTATE_MAX
        theta = jnp.where(jax.random.uniform(keys[13], (batch,)) < p_rot, theta, 0.0)
        g = g @ _rotate2d(theta)  # post-leg
    if "xfrac" in categories:
        t = jax.random.normal(keys[14], (batch, 2)) * XFRAC_STD
        t = jnp.where(gate(keys[15])[:, None], t, 0.0)
        g = g @ _translate2d(-t[:, 0] * width, -t[:, 1] * height)
    return g


def color_matrix(
    rng: jax.Array,
    batch: int,
    channels: int,
    p: jax.Array,
    categories: frozenset[str],
) -> jax.Array:
    """Compose the per-sample color transform C [B,4,4]."""
    keys = jax.random.split(rng, 10)
    c = _eye4(batch)

    def gate(key) -> jax.Array:
        return jax.random.uniform(key, (batch,)) < p

    if "brightness" in categories:
        b = jax.random.normal(keys[0], (batch,)) * BRIGHTNESS_STD
        b = jnp.where(gate(keys[1]), b, 0.0)
        m = _eye4(batch)
        m = m.at[:, 0, 3].set(b)
        m = m.at[:, 1, 3].set(b)
        m = m.at[:, 2, 3].set(b)
        c = m @ c
    if "contrast" in categories:
        s = jnp.exp2(jax.random.normal(keys[2], (batch,)) * CONTRAST_STD)
        s = jnp.where(gate(keys[3]), s, 1.0)
        m = _eye4(batch)
        m = m.at[:, 0, 0].set(s)
        m = m.at[:, 1, 1].set(s)
        m = m.at[:, 2, 2].set(s)
        c = m @ c
    v = _LUMA
    vvt = jnp.outer(v, v)
    if "lumaflip" in categories:
        i = jax.random.randint(keys[4], (batch,), 0, 2).astype(jnp.float32)
        i = jnp.where(gate(keys[5]), i, 0.0)
        m = _eye4(batch) - 2.0 * vvt[None] * i[:, None, None]
        c = m @ c
    if "hue" in categories and channels > 1:
        theta = (jax.random.uniform(keys[6], (batch,)) * 2.0 - 1.0) * jnp.pi * HUE_MAX
        theta = jnp.where(gate(keys[7]), theta, 0.0)
        c = _rotate3d_luma(theta) @ c
    if "saturation" in categories and channels > 1:
        s = jnp.exp2(jax.random.normal(keys[8], (batch,)) * SATURATION_STD)
        s = jnp.where(gate(keys[9]), s, 1.0)
        m = vvt[None] + (jnp.eye(4)[None] - vvt[None]) * s[:, None, None]
        c = m @ c
    return c


# Maximum anti-aliasing kernel half-width (input pixels). Minifications
# stronger than this are slightly under-filtered; with the published
# parameter ranges (scale/aniso log2-std 0.2 + rotation) the per-axis
# footprint virtually never exceeds it.
_AA_MAX_WIDTH = 4.0


def warp_bilinear(
    images: jax.Array,
    g_inv: jax.Array,
    *,
    antialias: bool = False,
    pallas: bool = False,
    supersample: bool = False,
    mesh=None,
) -> jax.Array:
    """Batched affine warp, NHWC, zero padding outside the frame.

    ``g_inv`` [B,3,3] maps centered output pixel coords -> centered input
    coords. The XLA path (default) is differentiable in both ``images``
    and ``g_inv``. The ``pallas=True`` path is differentiable in
    ``images`` ONLY: its custom VJP returns zero cotangents for the
    coordinates/widths (they derive from the augmentation RNG here), and
    ``stop_gradient`` is applied to them before the kernel so the
    contract is explicit — a caller differentiating through ``g_inv``
    must use the XLA path.

    ``mesh``: when a data-parallel ``jax.sharding.Mesh`` is active, the
    ENTIRE warp runs inside ``shard_map`` over the "data" axis. Both
    inner paths are batch-sequential (the XLA tent contraction scans the
    batch with ``lax.map``; the Pallas kernel has no SPMD partitioning
    rule), so left to the SPMD partitioner they lower to per-image
    cross-device collectives (the r01 dryrun's 20-second rendezvous
    stalls). The warp is purely per-image, so sharding the batch is
    exact; only ``images`` (already batch-sharded) and the [B,3,3]
    matrices cross the boundary (tests/test_buffer_sharding.py pins the
    compiled HLO).

    TPU-native formulation: per-pixel gathers run near scalar speed on
    TPU, so bilinear sampling is recast as **tent-weight contractions**:

        out[y,x] = sum_{y'} tent(sy[y,x]-y') * sum_{x'} tent(sx[y,x]-x') * img[y',x']

    where tent(d) = max(0, 1-|d|) is exactly the two-tap bilinear weight
    (and evaluates to 0 outside the frame = zero padding). The inner sum
    is an [X,X'] x [Y',X'] matmul per output row (MXU); the outer sum is
    an elementwise multiply-reduce (VPU). Work is chunked over output rows
    to bound the [rows, X, Y'] intermediate, and scanned over the batch.
    ~128x more FLOPs than a gather, but MXU FLOPs beat TPU gathers by far.

    ``antialias=True`` low-pass-filters minifying transforms (the published
    ADA pipeline does this by warping through a 2x supersampled, wavelet-
    filtered image; reference consumes it via pytorch-ada, train.py:175-188).
    Because the transform is affine, its Jacobian is constant per image, so
    the same effect comes from **adaptively widening the separable sampling
    kernel**: per-axis width w = clip(|J_row|_1, 1, 4) in input pixels,
    kernel tent(d/w)/w, normalized by its analytic full-grid sum so the DC
    gain is exactly 1 (out-of-frame taps still contribute zero CONTENT,
    preserving the zero-padding contract). At width 1 this reduces to the
    exact bilinear path. Cost: identical contraction shape — the dense
    tent matrices simply hold wider kernels (zero extra FLOPs, unlike the
    16x of true 2x supersampling with this formulation).
    """
    b = images.shape[0]
    # ``supersample=True`` (tpu.ada_supersample): the TRUE published
    # pipeline — 2x sym6 upsample, bilinear warp on the supersampled grid,
    # sym6 downsample — instead of the zero-cost adaptive-tent
    # approximation (~16x the warp FLOPs; see _warp_supersampled).
    impl = (
        _warp_supersampled
        if supersample
        else functools.partial(_warp_impl, antialias=antialias, pallas=pallas)
    )
    dp = mesh.shape.get("data", 1) if mesh is not None else 1
    if dp > 1 and b % dp == 0:
        from jax.sharding import PartitionSpec as P

        d = P("data")
        return jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(d, d),
            out_specs=d,
            check_vma=False,
        )(images, g_inv)
    return impl(images, g_inv)


def _warp_impl(
    images: jax.Array,
    g_inv: jax.Array,
    *,
    antialias: bool,
    pallas: bool,
) -> jax.Array:
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [H,W]
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [H,W,3]
    src = jnp.einsum("bij,hwj->bhwi", g_inv, grid)  # [B,H,W,3]
    sx = src[..., 0] + (w - 1) / 2.0  # [B,H,W]
    sy = src[..., 1] + (h - 1) / 2.0

    if antialias:
        # Per-image, per-axis kernel width: the L2 row norm of the
        # Jacobian — the radius of the output pixel's sampling ellipse
        # projected onto each input axis (EWA-style). The L1 norm
        # (round-2 choice) over-filters rotations: a pure rotation has L1
        # row sums up to sqrt(2) though its sampling density is unchanged
        # and the published supersampled pipeline leaves it sharp. The L2
        # rule is exactly 1 for rigid transforms (reducing to exact
        # bilinear) and s for a minification s — measured uniformly ~30%
        # closer to the 2x supersampled sym6 oracle across the ADA
        # parameter distribution (tests/test_ada_supersampled_oracle.py).
        jac = g_inv[:, :2, :2]
        width_x = jnp.clip(
            jnp.sqrt(jac[:, 0, 0] ** 2 + jac[:, 0, 1] ** 2), 1.0, _AA_MAX_WIDTH
        )
        width_y = jnp.clip(
            jnp.sqrt(jac[:, 1, 0] ** 2 + jac[:, 1, 1] ** 2), 1.0, _AA_MAX_WIDTH
        )
    else:
        width_x = width_y = jnp.ones((b,), jnp.float32)

    if pallas and c == 1 and h % 8 == 0 and w % min(w, 256) == 0 and h <= 512 and w <= 512:
        # Fused VMEM kernel (ops/pallas/warp.py): same tent contraction
        # without the HBM [chunk, W, H'] intermediate. Single-channel only;
        # differentiable in images only — coordinates/widths are
        # stop_gradient'd here (see docstring).
        from one_to_many_gan_tpu.ops.pallas.warp import warp_pallas

        sg = jax.lax.stop_gradient
        out = warp_pallas(
            images[..., 0], sg(sx), sg(sy), sg(width_x), sg(width_y), antialias
        )
        return out[..., None]

    return _tent_contract(images, sx, sy, width_x, width_y, antialias=antialias)


def _tent_contract(
    images: jax.Array,
    sx: jax.Array,
    sy: jax.Array,
    width_x: jax.Array,
    width_y: jax.Array,
    *,
    antialias: bool,
) -> jax.Array:
    """The chunked tent-weight contraction core: sample ``images``
    [B,H',W',C] at positions (sy, sx) [B,H,W] (input-pixel units, zero
    outside the frame) with per-image separable tent widths. The gather-
    free sampling engine shared by the direct warp and the supersampled
    path below."""
    b, hs, ws, c = images.shape
    _, h, w = sx.shape
    # Row chunk size: keep the per-image [chunk, W, H'] tent intermediate
    # ~<=16M elements (the whole image at 256²: fewest, largest matmuls —
    # batching the contraction across images instead was measured SLOWER,
    # 7.5 -> 12.4 ms at b16, because a [B]-batched matmul splits the MXU
    # M-dimension into B small ops).
    budget = 16 * 2**20  # elements
    chunk = max(1, min(h, budget // (w * hs)))
    while h % chunk:
        chunk -= 1
    n_chunks = h // chunk

    # Tap index ranges, extended when antialiasing so the normalizing
    # full-grid kernel sum counts out-of-frame taps: any position with
    # in-frame content lies within max_width of the frame, and its support
    # reaches another max_width beyond -> extend by 2 * max_width.
    r = 2 * int(_AA_MAX_WIDTH) if antialias else 0
    # taps span the SOURCE dims (H', W') — they index into ``images``;
    # the positions grid (h, w) only shapes the output
    xs_idx = jnp.arange(-r, ws + r, dtype=jnp.float32)
    ys_idx = jnp.arange(-r, hs + r, dtype=jnp.float32)

    # Contraction dtype follows the images (bf16 under the mixed-precision
    # policy: halves the [chunk,W,H'] HBM intermediate). Tent weights are
    # always COMPUTED in f32 — pixel coordinates up to H don't fit bf16 —
    # then cast for the contraction; accumulation stays f32 on the MXU.
    cdtype = images.dtype

    def warp_one(args):
        img, sx_i, sy_i, wx_w, wy_w = args  # [H',W',C], [H,W], [H,W], [], []

        def kernel(coords, idx, width):
            # [chunk, W, taps] scaled tent, normalized to full-grid sum 1.
            k = jax.nn.relu(1.0 - jnp.abs((coords[..., None] - idx) / width))
            if not antialias:
                return k
            # eps guards positions mapped beyond the extended tap range
            # (their in-frame content is all zero anyway -> output 0, not NaN)
            return k / jnp.maximum(jnp.sum(k, axis=-1, keepdims=True), 1e-8)

        def do_chunk(args):
            sx_c, sy_c = args  # [chunk, W] each
            wx = kernel(sx_c, xs_idx, wx_w)
            wy = kernel(sy_c, ys_idx, wy_w)
            if r:
                wx = wx[..., r : r + ws]  # drop out-of-frame taps: zero content
                wy = wy[..., r : r + hs]
            # inner contraction over x': [chunk, W, H', C]  (one big-M MXU
            # matmul per chunk)
            g = jnp.einsum(
                "rxp,ypc->rxyc",
                wx.astype(cdtype),
                img,
                preferred_element_type=cdtype,
            )
            # outer: elementwise multiply + reduce over y'   (VPU)
            out = jnp.einsum(
                "rxy,rxyc->rxc",
                wy.astype(cdtype),
                g,
                preferred_element_type=jnp.float32,
            )
            return out.astype(cdtype)

        if n_chunks == 1:
            return do_chunk((sx_i, sy_i))
        sx_r = sx_i.reshape(n_chunks, chunk, w)
        sy_r = sy_i.reshape(n_chunks, chunk, w)
        out = jax.lax.map(do_chunk, (sx_r, sy_r))  # [n_chunks, chunk, W, C]
        return out.reshape(h, w, c)

    return jax.lax.map(warp_one, (images, sx, sy, width_x, width_y))


# --------------------------------------------- true 2x supersampled warp

# sym6 scaling (low-pass) filter — public wavelet constants (sum = sqrt 2).
# The published ADA pipeline's geometric branch warps through a 2x
# supersampled, wavelet-filtered image; SYM6 is its published choice.
_SYM6_LO = np.array(
    [
        0.015404109327027373,
        0.0034907120842174702,
        -0.11799011114819057,
        -0.048311742585633,
        0.4910559419267466,
        0.787641141030194,
        0.3379294217276218,
        -0.07263752278646252,
        -0.021060292512300564,
        0.04472490177066578,
        0.0017677118642428036,
        -0.007800708325034148,
    ]
)


@functools.lru_cache(maxsize=8)
def _ss_updown_ops(n: int):
    """(U [2n,n], D [n,2n], a_up, a_dn): dense 2x up/down operators with
    the sym6 low-pass and their measured sample-position phases.

    The even-length wavelet has half-sample phases, so the up/down shift
    pair is SELF-CALIBRATED: pick the (c_up, c_dn) whose composition
    D @ U is closest to identity in the interior, then measure the
    residual phases from the operator row centroids. Upsampled pixel j
    then represents continuous input coordinate (j - a_up) / 2, and
    down-output i reads its centroid from upsampled position 2i + a_dn.
    Built once per size in numpy at trace time; applied as MXU matmuls.
    """
    f = _SYM6_LO / _SYM6_LO.sum()  # DC gain 1
    length = len(f)
    idx_n = np.arange(n)
    idx_2n = np.arange(2 * n)

    def up_op(c, m):
        # u[j, i] = 2 f[j - 2i + c], vectorized (a Python double loop here
        # cost minutes of trace time at 512²)
        k = idx_2n[: 2 * m, None] - 2 * idx_n[None, :m] + c
        valid = (k >= 0) & (k < length)
        return np.where(valid, 2 * f[np.clip(k, 0, length - 1)], 0.0)

    def down_op(c, m):
        k = idx_2n[None, : 2 * m] - 2 * idx_n[:m, None] + c
        valid = (k >= 0) & (k < length)
        return np.where(valid, f[np.clip(k, 0, length - 1)], 0.0)

    # Phase calibration is shift-invariant in the interior, so run it at a
    # small probe size (identical to n when n <= 64 — every tested size);
    # only the chosen (c_up, c_dn) carries over to the full-size build.
    m = min(n, 64)
    best = None
    for c_up in range(length):
        u_m = up_op(c_up, m)
        for c_dn in range(length):
            err = np.abs(down_op(c_dn, m) @ u_m - np.eye(m))[4:-4, 4:-4].sum()
            if best is None or err < best[0]:
                best = (err, c_up, c_dn)
    _, c_up, c_dn = best
    u, d = up_op(c_up, n), down_op(c_dn, n)
    j_mid = n
    a_up = j_mid - 2 * (u[j_mid] @ idx_n / u[j_mid].sum())
    i_mid = n // 2
    a_dn = (d[i_mid] @ idx_2n / d[i_mid].sum()) - 2 * i_mid
    return u, d, float(a_up), float(a_dn)


def _warp_supersampled(images: jax.Array, g_inv: jax.Array) -> jax.Array:
    """The published 2x supersampled filtered warp (tpu.ada_supersample).

    Pipeline: sym6 2x upsample (two dense MXU matmuls) -> plain bilinear
    warp on the supersampled grid (the shared gather-free tent
    contraction at width 1) -> sym6 low-pass 2x downsample. ~16x the
    direct warp's contraction FLOPs — the QUALITY opt-in; the default
    adaptive-tent path approximates this at zero extra cost and its error
    is bounded against the same construction
    (tests/test_ada_supersampled_oracle.py). Note: unlike the tent path,
    an identity transform is only interior-exact (D @ U deviates at the
    zero-extension borders), faithful to the published pipeline.
    Differentiable in ``images`` and ``g_inv``.
    """
    b, h, w, c = images.shape
    uh, dh, a_up_h, a_dn_h = _ss_updown_ops(h)
    uw, dw, a_up_w, a_dn_w = _ss_updown_ops(w)
    dtype = images.dtype
    uh_m, dh_m = jnp.asarray(uh, dtype), jnp.asarray(dh, dtype)
    uw_m, dw_m = jnp.asarray(uw, dtype), jnp.asarray(dw, dtype)

    img_up = jnp.einsum("Jh,bhwc->bJwc", uh_m, images)
    img_up = jnp.einsum("Kw,bJwc->bJKc", uw_m, img_up)  # [B,2H,2W,C]

    # supersampled OUTPUT grid: out2 pixel j represents output coordinate
    # (j - a_dn)/2; map through g_inv (centered convention), then to
    # upsampled-image pixel units via a_up.
    oy = (jnp.arange(2 * h, dtype=jnp.float32) - a_dn_h) / 2.0 - (h - 1) / 2.0
    ox = (jnp.arange(2 * w, dtype=jnp.float32) - a_dn_w) / 2.0 - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(oy, ox, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [2H,2W,3]
    src = jnp.einsum("bij,hwj->bhwi", g_inv, grid)
    sx_u = 2.0 * (src[..., 0] + (w - 1) / 2.0) + a_up_w  # [B,2H,2W]
    sy_u = 2.0 * (src[..., 1] + (h - 1) / 2.0) + a_up_h

    ones = jnp.ones((b,), jnp.float32)
    warped2 = _tent_contract(img_up, sx_u, sy_u, ones, ones, antialias=False)

    out = jnp.einsum("hJ,bJKc->bhKc", dh_m, warped2)
    return jnp.einsum("wK,bhKc->bhwc", dw_m, out)


def apply_color(images: jax.Array, cmat: jax.Array) -> jax.Array:
    """Apply per-sample 4x4 color matrices to NHWC images (C in {1, 3})."""
    c = images.shape[-1]
    dtype = images.dtype
    if c == 3:
        m = cmat[:, :3, :3].astype(dtype)  # [B,3,3]
        t = cmat[:, :3, 3].astype(dtype)  # [B,3]
        return (
            jnp.einsum("bhwc,bdc->bhwd", images, m) + t[:, None, None, :]
        )
    if c == 1:
        row = jnp.mean(cmat[:, :3, :], axis=1)  # [B,4]
        gain = jnp.sum(row[:, :3], axis=1).astype(dtype)  # [B]
        bias = row[:, 3].astype(dtype)
        return images * gain[:, None, None, None] + bias[:, None, None, None]
    msg = f"apply_color supports 1 or 3 channels, got {c}"
    raise ValueError(msg)


def augment(
    images: jax.Array,
    p: jax.Array | float,
    rng: jax.Array,
    categories: tuple[str, ...] = ALL_CATEGORIES,
    *,
    antialias: bool = True,
    pallas: bool = False,
    supersample: bool = False,
    mesh=None,
) -> jax.Array:
    """Differentiable ADA augmentation of an NHWC image batch.

    ``p`` is the shared per-category application probability (the ADA
    controller's output). Deterministic given ``rng``. ``antialias``
    low-pass-filters minifying geometric transforms (the published ADA
    pipeline's supersampled warp contract); see ``warp_bilinear``.
    ``pallas`` routes the geometric warp through the fused VMEM kernel
    (tpu.ada_pallas; single-channel images); pass ``mesh`` when a
    data-parallel mesh is active so the kernel runs shard_map'd over the
    batch axis (see ``warp_bilinear``). ``supersample``
    (tpu.ada_supersample) runs the TRUE 2x supersampled sym6-filtered
    warp instead of the adaptive-tent approximation — the quality opt-in
    at ~16x the warp FLOPs; it overrides ``antialias``/``pallas``.
    """
    cats = frozenset(categories)
    b, h, w, c = images.shape
    p = jnp.asarray(p, dtype=jnp.float32)
    k_geom, k_color = jax.random.split(rng)
    out = images
    if cats & {"xflip", "rotate90", "xint", "scale", "rotate", "aniso", "xfrac"}:
        g_inv = geometric_matrix(k_geom, b, h, w, p, cats)
        out = warp_bilinear(
            out, g_inv, antialias=antialias, pallas=pallas,
            supersample=supersample, mesh=mesh,
        )
    if cats & {"brightness", "contrast", "lumaflip", "hue", "saturation"}:
        cmat = color_matrix(k_color, b, c, p, cats)
        out = apply_color(out, cmat)
    return out
