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
    co_estimate_rotation: bool = False,
    pixel_coords=None,
):
    """Fit a parametric model to a dense (H, W, 3) direction image.

    With ``co_estimate_rotation`` a global rotation of the direction field
    is estimated jointly and returned as ``(model, quaternion)`` — apply
    it to ``camera_tr_rig`` as the reference does (calibration.cc:491-499).

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
    if pixel_coords is not None:
        # caller-supplied (H, W, 2) pixel coordinates of the raster cells
        # (e.g. a subsampled field whose cells are NOT at (i+0.5))
        pc = np.asarray(pixel_coords, np.float64)
        px = pc[vy[sel], vx[sel]]
    else:
        px = np.stack([vx[sel] + 0.5, vy[sel] + 0.5], -1)
    d = dense_dirs[vy[sel], vx[sel]]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    front = d[:, 2] > 1e-6
    px, d = px[front], d[front]
    nxy = d[:, :2] / d[:, 2:3]

    # Full stacked linear init (reference: FitSimpleParametricToDense-
    # ModelLinearly, parametric.cc:197-242): the pixel coordinate is
    # linear in the LIFTED unknowns (fx, fx·k1, …, cx) because every
    # distortion term is a known polynomial of the normalized coords.
    # Solving per-axis least squares recovers the pinhole block AND the
    # distortion coefficients — strong-fisheye fits start in the right
    # basin instead of at zero distortion.
    if isinstance(model_template, CentralThinPrismFisheyeModel) and \
            model_template.use_equidistant_projection:
        # the model distorts the equidistant-mapped coords; regress there
        rr = np.linalg.norm(nxy, axis=-1)
        theta = np.arctan(rr)
        scale = np.where(rr > 1e-12, theta / np.maximum(rr, 1e-12), 1.0)
        base = nxy * scale[:, None]
    else:
        base = nxy
    x_, y_ = base[:, 0], base[:, 1]
    r2 = x_ * x_ + y_ * y_
    r4, r6, r8 = r2 * r2, r2 ** 3, r2 ** 4
    xy = x_ * y_

    def axis_solve(coord, rows):
        a = np.stack(rows + [np.ones_like(x_)], -1)
        sol, *_ = np.linalg.lstsq(a, coord, rcond=None)
        return sol

    n_params = model_template.params.shape[-1]
    params0 = np.zeros(n_params)
    if isinstance(model_template, CentralThinPrismFisheyeModel):
        # px = fx·(x + k·radial + 2p1·xy + p2(r²+2x²) + sx1·r²) + cx
        sx_sol = axis_solve(px[:, 0], [
            x_, x_ * r2, x_ * r4, x_ * r6, x_ * r8,
            2 * xy, r2 + 2 * x_ * x_, r2,
        ])
        sy_sol = axis_solve(px[:, 1], [
            y_, y_ * r2, y_ * r4, y_ * r6, y_ * r8,
            r2 + 2 * y_ * y_, 2 * xy, r2,
        ])
        fx, cx = sx_sol[0], sx_sol[-1]
        fy, cy = sy_sol[0], sy_sol[-1]
        if abs(fx) > 1e-9 and abs(fy) > 1e-9:
            ks = 0.5 * (sx_sol[1:5] / fx + sy_sol[1:5] / fy)
            p1 = 0.5 * (sx_sol[5] / fx + sy_sol[6] / fy)
            p2 = 0.5 * (sx_sol[6] / fx + sy_sol[5] / fy)
            sx1 = sx_sol[7] / fx
            sy1 = sy_sol[7] / fy
            params0[4:8] = ks
            params0[8:10] = [p1, p2]
            params0[10:12] = [sx1, sy1]
    elif isinstance(model_template, CentralOpenCVModel):
        # numerator-polynomial + tangential part linearly (rational
        # denominators k4-k6 start at 0)
        sx_sol = axis_solve(px[:, 0], [
            x_, x_ * r2, x_ * r4, x_ * r6, 2 * xy, r2 + 2 * x_ * x_,
        ])
        sy_sol = axis_solve(px[:, 1], [
            y_, y_ * r2, y_ * r4, y_ * r6, r2 + 2 * y_ * y_, 2 * xy,
        ])
        fx, cx = sx_sol[0], sx_sol[-1]
        fy, cy = sy_sol[0], sy_sol[-1]
        if abs(fx) > 1e-9 and abs(fy) > 1e-9:
            params0[4:7] = 0.5 * (sx_sol[1:4] / fx + sy_sol[1:4] / fy)
            params0[10] = 0.5 * (sx_sol[4] / fx + sy_sol[5] / fy)  # p1
            params0[11] = 0.5 * (sx_sol[5] / fx + sy_sol[4] / fy)  # p2
    else:
        # radial-spline model: pinhole from the central 30% of the field
        # (the spline absorbs the radial profile during LM refinement)
        rr = np.linalg.norm(nxy, axis=-1)
        central = rr < max(np.percentile(rr, 30), 1e-3)
        a = np.zeros((2 * int(central.sum()), 4))
        a[0::2, 0] = nxy[central, 0]
        a[0::2, 2] = 1.0
        a[1::2, 1] = nxy[central, 1]
        a[1::2, 3] = 1.0
        rhs = px[central].reshape(-1)
        sol, *_ = np.linalg.lstsq(a, rhs, rcond=None)
        fx, fy, cx, cy = sol
    params0[:4] = [fx, fy, cx, cy]
    model = replace(model_template, params=jnp.asarray(params0, dtype))

    pts = jnp.asarray(d, dtype)
    target_px = jnp.asarray(px, dtype)

    if not co_estimate_rotation:
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

    # Co-estimate a rotation applied to the dense directions before
    # projection (reference parametric_r_dense, parametric.cc:427-462;
    # consumed by folding it into camera_tr_rig, calibration.cc:491-499).
    # State = (params, accumulated quaternion); the LM tangent carries a
    # 3-vector rotation increment retracted on the left.
    from camera_calibration_tpu.ops import se3 as se3_ops

    def residual_fn2(state):
        params, q = state
        m = replace(model, params=params)
        rd = se3_ops.quat_rotate(q, pts)
        pred, _, pvalid = project_points(m, rd)
        r = (pred - target_px) * pvalid[:, None]
        return r.reshape(-1)

    def retract_fn2(state, delta):
        params, q = state
        dp, dw = delta
        return (params + dp, se3_ops.quat_mul(se3_ops.quat_exp(dw), q))

    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
    result = lm_solve(
        residual_fn2,
        retract_fn2,
        (model.params, q0),
        (jnp.zeros_like(model.params), jnp.zeros(3, dtype)),
        max_iterations=max_iterations,
        cg_iterations=2 * n_params + 6,
    )
    params_f, q_f = result.state
    return replace(model, params=params_f), q_f
