"""Parametric central camera models: ThinPrismFisheye, OpenCV, Radial-spline.

Capability parity with the reference's parametric model family
(reference: applications/camera_calibration/src/camera_calibration/models/
central_thin_prism_fisheye.{h,cc}, central_opencv.{h,cc},
central_radial.{h,cc}, parametric.{h,cc}):

- CentralThinPrismFisheye: fx fy cx cy k1 k2 k3 k4 p1 p2 sx1 sy1, optional
  equidistant (fisheye) pre-step θ·atan — central_thin_prism_fisheye.cc:59-107.
- CentralOpenCV: fx fy cx cy k1..k6 p1 p2 rational radial —
  central_opencv.cc:59-99.
- CentralRadial: fx fy cx cy p1 p2 sx1 sy1 + a 1D cubic B-spline radial
  factor over the incidence angle θ ∈ [0, π/2) — central_radial.cc:238-292.

All projection paths are closed form and batched; unprojection inverts the
distortion with a batched Gauss-Newton using AD Jacobians (the reference's
UnprojectWithGaussNewton, parametric.h:60).  Fitting to dense direction
images = linear init on lifted products (parametric.cc:197-…) + LM refine
of projection residuals with the generic matrix-free engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.models.base import model_dataclass, replace, static_field
from camera_calibration_tpu.ops import bspline
from camera_calibration_tpu.ops.linalg import solve2x2


@model_dataclass(name="CentralThinPrismFisheyeModel")
class CentralThinPrismFisheyeModel:
    # fx fy cx cy k1 k2 k3 k4 p1 p2 sx1 sy1
    params: jnp.ndarray
    width: int = static_field(default=0)
    height: int = static_field(default=0)
    use_equidistant_projection: bool = static_field(default=True)

    @property
    def is_central(self):
        return True


@model_dataclass(name="CentralOpenCVModel")
class CentralOpenCVModel:
    # fx fy cx cy k1 k2 k3 k4 k5 k6 p1 p2
    params: jnp.ndarray
    width: int = static_field(default=0)
    height: int = static_field(default=0)

    @property
    def is_central(self):
        return True


@model_dataclass(name="CentralRadialModel")
class CentralRadialModel:
    # fx fy cx cy p1 p2 sx1 sy1 + spline knots (resolution K)
    params: jnp.ndarray
    width: int = static_field(default=0)
    height: int = static_field(default=0)

    @property
    def spline_resolution(self):
        return self.params.shape[-1] - 8

    @property
    def is_central(self):
        return True


# ----------------------------- distortion cores -----------------------------


def _tpf_distort(model: CentralThinPrismFisheyeModel, nxy):
    """Normalized (possibly fisheye) coords -> distorted coords (..., 2).

    (reference: central_thin_prism_fisheye.cc:79-105)
    """
    p = model.params
    x, y = nxy[..., 0], nxy[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    r4 = r2 * r2
    radial = p[4] * r2 + p[5] * r4 + p[6] * r4 * r2 + p[7] * r4 * r4
    dx = 2 * p[8] * xy + p[9] * (r2 + 2 * x2) + p[10] * r2
    dy = 2 * p[9] * xy + p[8] * (r2 + 2 * y2) + p[11] * r2
    return jnp.stack([x + radial * x + dx, y + radial * y + dy], axis=-1)


def _fisheye_forward(nxy):
    """(x/z, y/z) -> equidistant fisheye coords: scale by atan(r)/r."""
    r = jnp.linalg.norm(nxy, axis=-1, keepdims=True)
    safe_r = jnp.maximum(r, 1e-12)
    return nxy * jnp.arctan(safe_r) / safe_r


def _fisheye_inverse(fxy):
    """Fisheye coords (|.| = θ) -> (x/z, y/z): scale by tan(θ)/θ.

    (reference: central_thin_prism_fisheye.cc:158-163)
    """
    theta = jnp.linalg.norm(fxy, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    scale = jnp.where(theta > 1e-8, jnp.tan(safe) / safe, 1.0)
    return fxy * scale


def _opencv_distort(model: CentralOpenCVModel, nxy):
    """(reference: central_opencv.cc:59-99)"""
    p = model.params
    x, y = nxy[..., 0], nxy[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1 + p[4] * r2 + p[5] * r4 + p[6] * r6) / (
        1 + p[7] * r2 + p[8] * r4 + p[9] * r6
    )
    dx = 2 * p[10] * xy + p[11] * (r2 + 2 * x2)
    dy = 2 * p[11] * xy + p[10] * (r2 + 2 * y2)
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def _radial_factor(model: CentralRadialModel, theta):
    """1D B-spline factor over θ (reference: central_radial.cc:245-261)."""
    k = model.spline_resolution
    pos = 1.0 + (k - 3.0) / (jnp.pi / 2) * theta
    chunk = jnp.clip(jnp.floor(pos).astype(jnp.int32), 1, k - 3)
    frac = pos - chunk.astype(pos.dtype)
    knots = model.params[8:]

    def eval_one(c, f):
        win = jax.lax.dynamic_slice(knots, (c - 1,), (4,))
        return jnp.dot(bspline.cubic_bspline_weights(f), win)

    flat_c = chunk.reshape(-1)
    flat_f = frac.reshape(-1)
    vals = jax.vmap(eval_one)(flat_c, flat_f)
    return vals.reshape(theta.shape)


def _radial_distort(model: CentralRadialModel, nxy, theta):
    """(reference: central_radial.cc:263-285)"""
    p = model.params
    x, y = nxy[..., 0], nxy[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    factor = _radial_factor(model, theta)
    dx = 2 * p[4] * xy + p[5] * (r2 + 2 * x2) + p[6] * r2
    dy = 2 * p[5] * xy + p[4] * (r2 + 2 * y2) + p[7] * r2
    return jnp.stack(
        [x + factor * x + dx, y + factor * y + dy], axis=-1
    )


# ------------------------------- projection -------------------------------


def _apply_fc(model, dxy):
    p = model.params
    return jnp.stack(
        [p[0] * dxy[..., 0] + p[2], p[1] * dxy[..., 1] + p[3]], axis=-1
    )


def _inner_distort(model, nxy, theta=None):
    if isinstance(model, CentralThinPrismFisheyeModel):
        if model.use_equidistant_projection:
            nxy = _fisheye_forward(nxy)
        return _tpf_distort(model, nxy)
    if isinstance(model, CentralOpenCVModel):
        return _opencv_distort(model, nxy)
    if isinstance(model, CentralRadialModel):
        return _radial_distort(model, nxy, theta)
    raise TypeError(type(model))


def project_points(model, points, init_xy=None, max_iterations=None):
    """Project camera-space points (N, 3) -> (pixels, aux, valid).

    Closed form (not iterative); init_xy/max_iterations accepted for
    interface uniformity with grid models.  valid requires z > 0 and the
    pixel inside the image (reference Project() semantics).
    """
    z = points[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    nxy = points[..., :2] / safe_z[..., None]
    if isinstance(model, CentralRadialModel):
        norm = jnp.linalg.norm(points, axis=-1)
        cos_t = jnp.clip(z / jnp.maximum(norm, 1e-18), -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        dxy = _inner_distort(model, nxy, theta)
    else:
        dxy = _inner_distort(model, nxy)
    px = _apply_fc(model, dxy)
    valid = (
        (z > 1e-12)
        & (px[..., 0] >= 0)
        & (px[..., 0] < model.width)
        & (px[..., 1] >= 0)
        & (px[..., 1] < model.height)
    )
    return px, px, valid


def project_directions(model, dirs, **kw):
    px, aux, valid = project_points(model, dirs, **kw)
    return px, aux, valid


def unproject(model, pixels, max_iterations: int = 20):
    """Pixel-corner coords (N, 2) -> (unit directions (N, 3), valid).

    Batched Gauss-Newton inversion of the distortion (reference:
    parametric.h:60 UnprojectWithGaussNewton).  For CentralRadial the
    unknown is the full normalized direction via (nx, ny, θ) coupling, so
    we instead invert project() on the (nx, ny) parameterization of the
    direction (θ recomputed each iteration) — same fixed point.
    """
    p = model.params
    target = jnp.stack(
        [(pixels[..., 0] - p[2]) / p[0], (pixels[..., 1] - p[3]) / p[1]],
        axis=-1,
    )

    def distort_of_nxy(nxy):
        if isinstance(model, CentralRadialModel):
            d = jnp.concatenate([nxy, jnp.ones_like(nxy[..., :1])], -1)
            theta = jnp.arccos(
                jnp.clip(1.0 / jnp.linalg.norm(d, axis=-1), -1.0, 1.0)
            )
            return _radial_distort(model, nxy, theta)
        return _inner_distort(model, nxy)

    x = target  # init: undistorted ≈ distorted

    def body(_, x):
        def f_single(v):
            return distort_of_nxy(v[None])[0]

        jac = jax.vmap(jax.jacfwd(f_single))(x)
        r = distort_of_nxy(x) - target
        h = jnp.einsum("nij,nik->njk", jac, jac)
        b = jnp.einsum("nij,ni->nj", jac, r)
        h = h + 1e-12 * jnp.eye(2, dtype=x.dtype)
        return x - solve2x2(h, b)

    x = jax.lax.fori_loop(0, max_iterations, body, x)
    err = jnp.linalg.norm(distort_of_nxy(x) - target, axis=-1)
    valid = err < 1e-6

    # distort_of_nxy already includes the fisheye pre-step for TPF models,
    # so x is directly the undistorted (x/z, y/z).
    d = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d, valid


# --------------------------------- fitting ---------------------------------


def fit_parametric_to_dense(
    model_template,
    dense_dirs,
    valid,
    *,
    max_sample_count: int = 20000,
    max_iterations: int = 50,
    dtype=jnp.float64,
):
    """Fit a parametric model to a dense (H, W, 3) direction image.

    Linear init of pinhole + lifted distortion products on the sampled
    pixels (reference: parametric.cc:197-…, stacked per-pixel linear
    systems parametric.cc:234-242), then LM refinement of the projection
    residuals with the matrix-free engine.
    """
    from camera_calibration_tpu.ba.gn import lm_solve

    dense_dirs = np.asarray(dense_dirs, np.float64)
    valid = np.asarray(valid, bool)
    h, w = valid.shape
    vy, vx = np.nonzero(valid)
    stride = max(1, vy.size // max_sample_count)
    sel = np.arange(0, vy.size, stride)
    px = np.stack([vx[sel] + 0.5, vy[sel] + 0.5], -1)
    d = dense_dirs[vy[sel], vx[sel]]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    front = d[:, 2] > 1e-6
    px, d = px[front], d[front]
    nxy = d[:, :2] / d[:, 2:3]

    # Linear pinhole init on central samples (small radius, low distortion).
    r = np.linalg.norm(nxy, axis=-1)
    central = r < max(np.percentile(r, 30), 1e-3)
    a = np.zeros((2 * central.sum(), 4))
    a[0::2, 0] = nxy[central, 0]
    a[0::2, 2] = 1.0
    a[1::2, 1] = nxy[central, 1]
    a[1::2, 3] = 1.0
    rhs = px[central].reshape(-1)
    sol, *_ = np.linalg.lstsq(a, rhs, rcond=None)
    fx, fy, cx, cy = sol

    n_params = model_template.params.shape[-1]
    params0 = np.zeros(n_params)
    params0[:4] = [fx, fy, cx, cy]
    model = replace(model_template, params=jnp.asarray(params0, dtype))

    pts = jnp.asarray(d, dtype)
    target_px = jnp.asarray(px, dtype)

    def residual_fn(params):
        m = replace(model, params=params)
        pred, _, pvalid = project_points(m, pts)
        r = (pred - target_px) * pvalid[:, None]
        return r.reshape(-1)

    result = lm_solve(
        residual_fn,
        lambda params, delta: params + delta,
        model.params,
        jnp.zeros_like(model.params),
        max_iterations=max_iterations,
        cg_iterations=2 * n_params,
    )
    return replace(model, params=result.state)
