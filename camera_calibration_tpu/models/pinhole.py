"""Pinhole (+ optional radial-tangential) camera for synthetic ground truth.

Role parity with the reference's libvis parametric camera zoo used by its
tests and synthetic-data tools (reference: libvis/src/libvis/camera.h:281,
1741 — PinholeCamera4f etc.): define dense direction images and render
synthetic datasets; not itself a calibration target.

Pixel-corner convention: ``pixel = (fx·x/z + cx, fy·y/z + cy)`` with cx,cy
measured from the image corner.
"""

from __future__ import annotations

import jax.numpy as jnp

from camera_calibration_tpu.models.base import model_dataclass, static_field


@model_dataclass(name="PinholeCamera")
class PinholeCamera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = static_field(default=640)
    height: int = static_field(default=480)


def make_pinhole(fx, fy, cx, cy, width, height, dtype=jnp.float64):
    return PinholeCamera(
        fx=jnp.asarray(fx, dtype),
        fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype),
        cy=jnp.asarray(cy, dtype),
        width=int(width),
        height=int(height),
    )


def project(cam: PinholeCamera, points):
    """Project camera-space points (..., 3) to pixel-corner coords (..., 2).

    Returns (pixels, valid); valid requires z > 0 and inside the image.
    """
    z = points[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = cam.fx * points[..., 0] / safe_z + cam.cx
    v = cam.fy * points[..., 1] / safe_z + cam.cy
    px = jnp.stack([u, v], axis=-1)
    valid = (
        (z > 1e-12)
        & (u >= 0.0)
        & (u < cam.width)
        & (v >= 0.0)
        & (v < cam.height)
    )
    return px, valid


def unproject(cam: PinholeCamera, pixels):
    """Unproject pixel-corner coords (..., 2) to unit directions (..., 3)."""
    x = (pixels[..., 0] - cam.cx) / cam.fx
    y = (pixels[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def direction_image(cam: PinholeCamera, dtype=jnp.float64):
    """Dense (H, W, 3) unit-direction image sampled at pixel centers."""
    yy, xx = jnp.meshgrid(
        jnp.arange(cam.height, dtype=dtype) + 0.5,
        jnp.arange(cam.width, dtype=dtype) + 0.5,
        indexing="ij",
    )
    return unproject(cam, jnp.stack([xx, yy], axis=-1))
