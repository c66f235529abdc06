"""NoncentralGeneric camera model: per-pixel observation *lines*.

Capability parity with the reference's NoncentralGenericModel (reference:
applications/camera_calibration/src/camera_calibration/models/
noncentral_generic.h:50-142, noncentral_generic.cc): two B-spline grids —
a unit-direction grid and an origin-point grid — define a 3D line per
pixel; unprojection = (normalized direction spline, origin spline);
projection = batched 2-DoF LM minimizing the point-to-line distance
(noncentral_generic.cc:156-…); 5 DoF per knot (2 direction tangent +
3 origin).  Initialization from a central model: direction grid copied,
origin grid zero.

Projection Jacobians use the implicit-function theorem at the converged
projection with AD on the *fixed-window* spline expression (no
differentiation through the solver loop) — the same design as the
central model but with the window pinned, since the point-to-line
residual is a closed small expression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from camera_calibration_tpu.models.base import model_dataclass, static_field
from camera_calibration_tpu.ops import bspline
from camera_calibration_tpu.ops.linalg import solve2x2


@model_dataclass(name="NoncentralGenericModel")
class NoncentralGenericModel:
    direction_grid: jnp.ndarray  # (Hg, Wg, 3) unit directions
    point_grid: jnp.ndarray  # (Hg, Wg, 3) line origins
    width: int = static_field(default=0)
    height: int = static_field(default=0)
    calibration_min_x: int = static_field(default=0)
    calibration_min_y: int = static_field(default=0)
    calibration_max_x: int = static_field(default=0)
    calibration_max_y: int = static_field(default=0)

    @property
    def grid_height(self):
        return self.direction_grid.shape[0]

    @property
    def grid_width(self):
        return self.direction_grid.shape[1]

    @property
    def is_central(self):
        return False


def from_central(central_model):
    """Initialize from a central model (reference: noncentral init path)."""
    return NoncentralGenericModel(
        direction_grid=central_model.grid,
        point_grid=jnp.zeros_like(central_model.grid),
        width=central_model.width,
        height=central_model.height,
        calibration_min_x=central_model.calibration_min_x,
        calibration_min_y=central_model.calibration_min_y,
        calibration_max_x=central_model.calibration_max_x,
        calibration_max_y=central_model.calibration_max_y,
    )


def _extent(model):
    return (
        model.calibration_max_x + 1 - model.calibration_min_x,
        model.calibration_max_y + 1 - model.calibration_min_y,
    )


def pixel_to_grid(model, xy):
    ex, ey = _extent(model)
    gx = 1.0 + (model.grid_width - 3.0) * (xy[..., 0] - model.calibration_min_x) / ex
    gy = 1.0 + (model.grid_height - 3.0) * (xy[..., 1] - model.calibration_min_y) / ey
    return jnp.stack([gx, gy], axis=-1)


def grid_to_pixel(model, gxy):
    ex, ey = _extent(model)
    px = model.calibration_min_x + (gxy[..., 0] - 1.0) / (model.grid_width - 3.0) * ex
    py = model.calibration_min_y + (gxy[..., 1] - 1.0) / (model.grid_height - 3.0) * ey
    return jnp.stack([px, py], axis=-1)


def is_in_calibrated_area(model, xy):
    return (
        (xy[..., 0] >= model.calibration_min_x)
        & (xy[..., 0] < model.calibration_max_x + 1)
        & (xy[..., 1] >= model.calibration_min_y)
        & (xy[..., 1] < model.calibration_max_y + 1)
    )


def _eval_line(model, gxy):
    """(unit direction, origin) at continuous grid coords (2,)."""
    u = bspline.eval_surface(model.direction_grid, gxy[0], gxy[1])
    o = bspline.eval_surface(model.point_grid, gxy[0], gxy[1])
    d = u / jnp.linalg.norm(u)
    return d, o


def unproject(model, xy):
    """Pixel-corner coords (..., 2) -> (unit dirs, origins, valid)."""
    g = pixel_to_grid(model, xy)
    flat = g.reshape(-1, 2)
    d, o = jax.vmap(lambda p: _eval_line(model, p))(flat)
    d = d.reshape(xy.shape[:-1] + (3,))
    o = o.reshape(xy.shape[:-1] + (3,))
    return d, o, is_in_calibrated_area(model, xy)


def _point_line_residual(model, g, x):
    """Perpendicular offset of x from the line at grid coords g: (3,)."""
    d, o = _eval_line(model, g)
    v = x - o
    return v - jnp.dot(v, d) * d


def project_points(
    model: NoncentralGenericModel,
    points,
    init_xy=None,
    max_iterations: int = 50,
    eps: float | None = None,
):
    """Batched projection: find the pixel whose line passes through x.

    (reference: noncentral_generic.cc:156-… — 2-DoF LM on the point-to-
    line distance.)  Returns (pixel_xy, grid_xy, valid).
    """
    dtype = model.direction_grid.dtype
    points = points.astype(dtype)
    n = points.shape[0]
    if eps is None:
        eps = 1e-16 if dtype == jnp.float64 else 1e-10
    if init_xy is None:
        center = jnp.asarray(
            [
                0.5 * (model.calibration_min_x + model.calibration_max_x + 1),
                0.5 * (model.calibration_min_y + model.calibration_max_y + 1),
            ],
            dtype,
        )
        init_xy = jnp.broadcast_to(center, (n, 2))
    g = pixel_to_grid(model, init_xy.astype(dtype))
    lo = pixel_to_grid(
        model,
        jnp.asarray([model.calibration_min_x, model.calibration_min_y], dtype),
    )
    hi = pixel_to_grid(
        model,
        jnp.asarray(
            [model.calibration_max_x + 0.999, model.calibration_max_y + 0.999],
            dtype,
        ),
    )

    res_one = lambda g1, x1: _point_line_residual(model, g1, x1)
    jac_one = jax.jacfwd(res_one, argnums=0)
    res_batch = jax.vmap(res_one)
    jac_batch = jax.vmap(jac_one)

    def cost_at(g_pts):
        r = res_batch(g_pts, points)
        return jnp.sum(r * r, axis=-1)

    def body(carry):
        it, g, lam, done = carry
        r = res_batch(g, points)
        jac = jac_batch(g, points)  # (n, 3, 2)
        cost = jnp.sum(r * r, axis=-1)
        h = jnp.einsum("nik,nil->nkl", jac, jac)
        b = jnp.einsum("nik,ni->nk", jac, r)
        lam = jnp.where(lam < 0, 0.01 * 0.5 * (h[:, 0, 0] + h[:, 1, 1]), lam)
        step = solve2x2(h + lam[:, None, None] * jnp.eye(2, dtype=dtype), b)
        g_test = jnp.clip(g - step, lo, hi)
        test_cost = cost_at(g_test)
        accept = (test_cost < cost) & (~done)
        g = jnp.where(accept[:, None], g_test, g)
        lam = jnp.where(accept, 0.5 * lam, 2.0 * lam)
        done = done | (cost < eps)
        return it + 1, g, lam, done

    def cond(carry):
        it, _, _, done = carry
        return (it < max_iterations) & (~jnp.all(done))

    _, g, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), g, jnp.full((n,), -1.0, dtype),
                     jnp.zeros((n,), bool))
    )
    final_cost = cost_at(g)
    # converged when the perpendicular distance is tiny relative to range
    scale = jnp.maximum(jnp.linalg.norm(points, axis=-1), 1e-6)
    valid = jnp.sqrt(final_cost) < 1e-4 * scale
    return grid_to_pixel(model, g), g, valid


def projection_blocks(model: NoncentralGenericModel, g_star, x_cam):
    """Implicit-function-theorem sensitivities at converged projections.

    Returns dict:
      - ``pix_wrt_x``   (N, 2, 3): d pixel / d x_cam
      - ``j_win``       (N, 2, 4, 4, 5): d pixel / d (knot tangent) with
        tangent layout (dir_t1, dir_t2, origin_xyz) per window knot
      - ``win_flat``    (N, 4, 4) int32
    """
    from camera_calibration_tpu.ops import manifolds

    dtype = model.direction_grid.dtype
    gw = model.grid_width
    sx = (model.grid_width - 3.0) / _extent(model)[0]
    sy = (model.grid_height - 3.0) / _extent(model)[1]
    inv_scale = jnp.asarray([1.0 / sx, 1.0 / sy], dtype)
    t1g, t2g = manifolds.direction_tangents(model.direction_grid)
    frames = jnp.stack([t1g, t2g], axis=-1).reshape(-1, 3, 2)

    def one(g, x):
        win_d, bx, by = bspline.gather_window_2d(model.direction_grid, g[0], g[1])
        win_o, _, _ = bspline.gather_window_2d(model.point_grid, g[0], g[1])

        def r_fn(gg, wd, wo, xx):
            u = bspline.eval_window_fixed_base(wd, bx, by, gg[0], gg[1])
            o = bspline.eval_window_fixed_base(wo, bx, by, gg[0], gg[1])
            d = u / jnp.linalg.norm(u)
            v = xx - o
            return v - jnp.dot(v, d) * d

        j_g = jax.jacfwd(r_fn, argnums=0)(g, win_d, win_o, x)  # (3,2)
        j_wd = jax.jacfwd(r_fn, argnums=1)(g, win_d, win_o, x)  # (3,4,4,3)
        j_wo = jax.jacfwd(r_fn, argnums=2)(g, win_d, win_o, x)
        j_x = jax.jacfwd(r_fn, argnums=3)(g, win_d, win_o, x)  # (3,3)

        h = j_g.T @ j_g
        p_grid = -solve2x2(jnp.broadcast_to(h, (3, 2, 2)), j_g).T  # (2,3)
        p_px = p_grid * inv_scale[:, None]

        off = jnp.arange(4, dtype=bx.dtype)
        gx_idx = bx + off
        gy_idx = by + off
        win_flat = gy_idx[:, None] * gw + gx_idx[None, :]
        win_frames = frames[win_flat]  # (4,4,3,2)

        jw_dir_amb = jnp.einsum("ik,kyxc->iyxc", p_px, j_wd)  # (2,4,4,3)
        jw_dir = jnp.einsum("iyxc,yxcj->iyxj", jw_dir_amb, win_frames)
        jw_org = jnp.einsum("ik,kyxc->iyxc", p_px, j_wo)  # (2,4,4,3)
        j_win = jnp.concatenate([jw_dir, jw_org], axis=-1)  # (2,4,4,5)
        pix_wrt_x = p_px @ j_x  # (2,3)
        return pix_wrt_x, j_win, win_flat

    pix_wrt_x, j_win, win_flat = jax.vmap(one)(g_star, x_cam)
    return {"pix_wrt_x": pix_wrt_x, "j_win": j_win, "win_flat": win_flat}
