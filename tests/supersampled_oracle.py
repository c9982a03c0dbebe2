"""Test-only oracle: the published 2x supersampled, wavelet-filtered
affine warp (the StyleGAN2-ADA geometric-augmentation contract the
reference consumes via pytorch-ada, reference train.py:175-188).

Written from the published method description — NOT from any pipeline's
code: the input is 2x-upsampled with the sym6 scaling filter, the affine
transform is applied by bilinear sampling on the supersampled grid, and
the result is low-pass downsampled back with the same filter. The
augment/pipeline.py adaptive-tent path approximates this; the bound is
asserted in tests/test_ada_supersampled_oracle.py.

Coordinate convention matches warp_bilinear: ``g_inv`` [3,3] maps
CENTERED output pixel coords to centered input coords, zero padding
outside the frame. Filter phases are self-calibrated (the even-length
wavelet has half-sample phases; we pick the up/down shift pair that
makes down(up(x)) ~= x, and measure the residual phase from the operator
centroids) — nothing is transcribed from any implementation.
"""

from __future__ import annotations

import functools

import numpy as np

# sym6 scaling (low-pass) filter — public wavelet constants (sum = sqrt 2).
SYM6_LO = np.array(
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
def _updown_ops(n: int):
    """(U [2n,n], D [n,2n], a_up, a_down): 2x up/down operators with the
    sym6 filter and their measured sample-position phases.

    up pixel j represents continuous input coordinate (j - a_up) / 2;
    down output i draws its centroid from up position 2*i + a_down.
    Shifts are chosen (self-calibrated) so D @ U ~= I in the interior.
    """
    f = SYM6_LO / SYM6_LO.sum()  # DC gain 1
    length = len(f)

    def up_op(c):
        u = np.zeros((2 * n, n))
        for j in range(2 * n):
            i0 = (j + c - length + 1 + 1) // 2
            for i in range(max(0, i0 - 1), min(n, (j + c) // 2 + 1)):
                k = j - 2 * i + c
                if 0 <= k < length:
                    u[j, i] = 2 * f[k]
        return u

    def down_op(c):
        d = np.zeros((n, 2 * n))
        for i in range(n):
            for j in range(2 * n):
                k = j - 2 * i + c
                if 0 <= k < length:
                    d[i, j] = f[k]
        return d

    best = None
    for c_up in range(length):
        u = up_op(c_up)
        for c_dn in range(length):
            d = down_op(c_dn)
            m = d @ u
            err = np.abs(m - np.eye(n))[4:-4, 4:-4].sum()
            if best is None or err < best[0]:
                best = (err, c_up, c_dn, u, d)
    _, c_up, c_dn, u, d = best

    # measured phases from operator centroids (interior rows)
    idx = np.arange(n)
    j_mid = n  # central row of U
    a_up = j_mid - 2 * (u[j_mid] @ idx / u[j_mid].sum())
    jdx = np.arange(2 * n)
    i_mid = n // 2
    a_dn = (d[i_mid] @ jdx / d[i_mid].sum()) - 2 * i_mid
    return u, d, float(a_up), float(a_dn)


def _bilinear_gather(img: np.ndarray, sy: np.ndarray, sx: np.ndarray) -> np.ndarray:
    """Bilinear sample img [H,W] at float positions, zero outside."""
    h, w = img.shape
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    wy = sy - y0
    wx = sx - x0
    out = np.zeros(sy.shape)
    for dy, fy in ((0, 1 - wy), (1, wy)):
        for dx, fx in ((0, 1 - wx), (1, wx)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            vals = np.where(valid, img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0.0)
            out += fy * fx * vals
    return out


def supersampled_warp(x: np.ndarray, g_inv: np.ndarray) -> np.ndarray:
    """The published 2x supersampled filtered warp.

    x: [B,H,W,1] float; g_inv: [B,3,3] centered output->input affines.
    Returns [B,H,W,1]. Slow (dense numpy) — test-only.
    """
    b, h, w, _ = x.shape
    uh, dh, a_up_h, a_dn_h = _updown_ops(h)
    uw, dw, a_up_w, a_dn_w = _updown_ops(w)

    # supersampled OUTPUT grid: out2 pixel j represents output coordinate
    # (j - a_dn)/2 (the position the downsampling filter's centroid reads)
    oy = (np.arange(2 * h) - a_dn_h) / 2.0 - (h - 1) / 2.0
    ox = (np.arange(2 * w) - a_dn_w) / 2.0 - (w - 1) / 2.0
    gy, gx = np.meshgrid(oy, ox, indexing="ij")

    out = np.zeros_like(x)
    for i in range(b):
        img_up = uh @ x[i, :, :, 0] @ uw.T  # [2H, 2W]
        m = g_inv[i]
        sx_c = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]  # centered input coords
        sy_c = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        # -> upsampled-image pixel positions: j = 2*coord + a_up
        sx_u = 2.0 * (sx_c + (w - 1) / 2.0) + a_up_w
        sy_u = 2.0 * (sy_c + (h - 1) / 2.0) + a_up_h
        warped2 = _bilinear_gather(img_up, sy_u, sx_u)  # [2H, 2W]
        out[i, :, :, 0] = dh @ warped2 @ dw.T
    return out
