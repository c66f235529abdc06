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
