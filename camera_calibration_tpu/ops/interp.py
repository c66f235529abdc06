"""Image interpolation (bilinear, with Jacobian) — pure jnp, batched.

Equivalent of the reference's Image::InterpolateBilinear /
InterpolateBilinearWithJacobian (reference: libvis/src/libvis/
image.h:827-880).  Positions use the *pixel-center* convention: (0, 0) is
the center of the top-left pixel, valid sample domain [0, W−1]×[0, H−1].
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(image, xy):
    """Sample image (H, W) or (H, W, C) at positions (..., 2) (x, y).

    Out-of-bounds positions are clamped; use `in_bounds` for validity.
    """
    h, w = image.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, w - 2)
    y0 = jnp.clip(y0, 0, h - 2)
    tx = x - x0
    ty = y - y0
    if image.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    v00 = image[y0, x0]
    v10 = image[y0, x0 + 1]
    v01 = image[y0 + 1, x0]
    v11 = image[y0 + 1, x0 + 1]
    top = v00 + tx * (v10 - v00)
    bot = v01 + tx * (v11 - v01)
    return top + ty * (bot - top)


def bilinear_with_jacobian(image, xy):
    """Sample + spatial gradient.

    Returns (value, grad) with grad shape (..., 2) for single-channel or
    (..., C, 2) for multi-channel images; grad columns are d/dx, d/dy.
    (reference: image.h:827-880 InterpolateBilinearWithJacobian)
    """
    h, w = image.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.000001)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    tx = x - x0
    ty = y - y0
    v00 = image[y0, x0]
    v10 = image[y0, x0 + 1]
    v01 = image[y0 + 1, x0]
    v11 = image[y0 + 1, x0 + 1]
    if image.ndim == 3:
        txe = tx[..., None]
        tye = ty[..., None]
    else:
        txe, tye = tx, ty
    top = v00 + txe * (v10 - v00)
    bot = v01 + txe * (v11 - v01)
    value = top + tye * (bot - top)
    dx = (v10 - v00) + tye * ((v11 - v01) - (v10 - v00))
    dy = bot - top
    grad = jnp.stack([dx, dy], axis=-1)
    return value, grad


def in_bounds(image_shape, xy, margin: float = 0.0):
    """Validity of pixel-center positions for bilinear sampling."""
    h, w = image_shape[:2]
    return (
        (xy[..., 0] >= margin)
        & (xy[..., 0] <= w - 1 - margin)
        & (xy[..., 1] >= margin)
        & (xy[..., 1] <= h - 1 - margin)
    )


def _catmull_rom_w(t):
    """Catmull-Rom weights for the 4 taps around a sample at fraction t
    (the reference's CubicHermiteSpline, image.h CubicHermiteSplineVector,
    used by InterpolateBicubic*)."""
    t2 = t * t
    t3 = t2 * t
    return (
        0.5 * (-t3 + 2.0 * t2 - t),
        0.5 * (3.0 * t3 - 5.0 * t2 + 2.0),
        0.5 * (-3.0 * t3 + 4.0 * t2 + t),
        0.5 * (t3 - t2),
    )


def _catmull_rom_dw(t):
    """d/dt of the Catmull-Rom weights."""
    t2 = t * t
    return (
        0.5 * (-3.0 * t2 + 4.0 * t - 1.0),
        0.5 * (9.0 * t2 - 10.0 * t),
        0.5 * (-9.0 * t2 + 8.0 * t + 1.0),
        0.5 * (3.0 * t2 - 2.0 * t),
    )


def _bicubic_taps(image, xy):
    """Shared tap gather: (v (..., 4, 4[, C]), tx, ty) with taps clamped
    to the image so out-of-domain lookups stay finite (validity is the
    caller's job via in_bounds(margin=1), matching the reference's
    [1, L-1) valid-range contract, image.h:875)."""
    h, w = image.shape[:2]
    x = jnp.clip(xy[..., 0], 1.0, w - 2.000001)
    y = jnp.clip(xy[..., 1], 1.0, h - 2.000001)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 1, w - 3)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 1, h - 3)
    tx = x - x0
    ty = y - y0
    # (..., 4, 4) taps: rows dy=-1..2, cols dx=-1..2
    dy = jnp.arange(-1, 3)
    dx = jnp.arange(-1, 3)
    yy = y0[..., None, None] + dy[:, None]
    xx = x0[..., None, None] + dx[None, :]
    v = image[yy, xx]
    return v, tx, ty


def bicubic(image, xy):
    """Catmull-Rom bicubic sampling of image (H, W) or (H, W, C) at
    pixel-center positions (..., 2).  Valid domain [1, W-2]x[1, H-2]
    (reference: image.h InterpolateBicubicVector)."""
    v, tx, ty = _bicubic_taps(image, xy)
    wx = jnp.stack(_catmull_rom_w(tx), -1)
    wy = jnp.stack(_catmull_rom_w(ty), -1)
    if image.ndim == 3:
        rows = jnp.einsum("...yxc,...x->...yc", v, wx)
        return jnp.einsum("...yc,...y->...c", rows, wy)
    rows = jnp.einsum("...yx,...x->...y", v, wx)
    return jnp.einsum("...y,...y->...", rows, wy)


def bicubic_with_jacobian(image, xy):
    """Bicubic sample + spatial gradient (d/dx, d/dy).

    Returns (value, grad) with grad (..., 2) for single-channel or
    (..., C, 2) for (H, W, C) images — the analytic derivative of the
    separable Catmull-Rom surface (reference:
    image.h InterpolateBicubicVectorWithJacobian)."""
    v, tx, ty = _bicubic_taps(image, xy)
    wx = jnp.stack(_catmull_rom_w(tx), -1)
    wy = jnp.stack(_catmull_rom_w(ty), -1)
    dwx = jnp.stack(_catmull_rom_dw(tx), -1)
    dwy = jnp.stack(_catmull_rom_dw(ty), -1)
    if image.ndim == 3:
        rows = jnp.einsum("...yxc,...x->...yc", v, wx)
        rows_dx = jnp.einsum("...yxc,...x->...yc", v, dwx)
        value = jnp.einsum("...yc,...y->...c", rows, wy)
        gx = jnp.einsum("...yc,...y->...c", rows_dx, wy)
        gy = jnp.einsum("...yc,...y->...c", rows, dwy)
        return value, jnp.stack([gx, gy], -1)
    rows = jnp.einsum("...yx,...x->...y", v, wx)
    rows_dx = jnp.einsum("...yx,...x->...y", v, dwx)
    value = jnp.einsum("...y,...y->...", rows, wy)
    gx = jnp.einsum("...y,...y->...", rows_dx, wy)
    gy = jnp.einsum("...y,...y->...", rows, dwy)
    return value, jnp.stack([gx, gy], -1)
