"""CentralGeneric camera model: a B-spline grid of unit observation directions.

The flagship "10k parameter" model.  Capability parity with the reference's
CentralGenericModel (reference: applications/camera_calibration/src/
camera_calibration/models/central_generic.h:48, central_grid.h:43):

- ``unproject(pixel)`` = normalized bicubic-B-spline interpolation of a
  (Hg, Wg) grid of unit directions (central_generic.h:97-105).
- ``project(direction)`` = iterative 2-DoF LM inversion of unprojection with
  warm starts, test state clamped to the calibrated area, λ·{0.5, 2}
  (central_generic.cc:433-519).  Here the LM loop is *batched*: all points
  iterate together under one ``lax.while_loop`` with per-point λ/accept
  state — the TPU-native replacement for the reference's per-call loop.
- grid ↔ pixel mapping with a 1-cell border: grid coord
  ``1 + (W-3)·(px-min_x)/(max_x+1-min_x)`` (central_grid.h:127-161).
- Projection Jacobians come from the implicit-function theorem at the
  converged projection (exact, closed form) instead of the reference's
  numeric knot-perturbation re-projections (central_grid.h:188-245) — both
  faster and more accurate.

The model is a pytree; ``grid`` is the only leaf, so ``jax.grad`` /
``jax.jvp`` flow through unprojection directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from camera_calibration_tpu.models.base import model_dataclass, static_field
from camera_calibration_tpu.ops import bspline
from camera_calibration_tpu.ops.linalg import solve2x2


@model_dataclass(name="CentralGenericModel")
class CentralGenericModel:
    # (Hg, Wg, 3) unit directions; y-major (row = grid y).
    grid: jnp.ndarray
    width: int = static_field(default=0)
    height: int = static_field(default=0)
    calibration_min_x: int = static_field(default=0)
    calibration_min_y: int = static_field(default=0)
    calibration_max_x: int = static_field(default=0)  # inclusive, like reference
    calibration_max_y: int = static_field(default=0)

    @property
    def grid_height(self):
        return self.grid.shape[0]

    @property
    def grid_width(self):
        return self.grid.shape[1]

    @property
    def is_central(self):
        return True


def _extent(model):
    ex = model.calibration_max_x + 1 - model.calibration_min_x
    ey = model.calibration_max_y + 1 - model.calibration_min_y
    return ex, ey


def pixel_to_grid(model: CentralGenericModel, xy):
    """Pixel-corner coords (..., 2) -> continuous grid coords (..., 2).

    (reference: central_grid.h:148-154 PixelCornerConvToGridPoint)
    """
    ex, ey = _extent(model)
    gx = 1.0 + (model.grid_width - 3.0) * (xy[..., 0] - model.calibration_min_x) / ex
    gy = 1.0 + (model.grid_height - 3.0) * (xy[..., 1] - model.calibration_min_y) / ey
    return jnp.stack([gx, gy], axis=-1)


def grid_to_pixel(model: CentralGenericModel, gxy):
    """Inverse of pixel_to_grid (reference: central_grid.h:127-135)."""
    ex, ey = _extent(model)
    px = model.calibration_min_x + (gxy[..., 0] - 1.0) / (model.grid_width - 3.0) * ex
    py = model.calibration_min_y + (gxy[..., 1] - 1.0) / (model.grid_height - 3.0) * ey
    return jnp.stack([px, py], axis=-1)


def pixel_scale_to_grid_scale(model: CentralGenericModel):
    """(sx, sy) with grid_delta = s · pixel_delta (central_grid.h:156-161)."""
    ex, ey = _extent(model)
    return ((model.grid_width - 3.0) / ex, (model.grid_height - 3.0) / ey)


def grid_point_pixels(model: CentralGenericModel):
    """Pixel-corner locations of all knots, (Hg, Wg, 2) (central_grid.h:127)."""
    gy, gx = jnp.meshgrid(
        jnp.arange(model.grid_height, dtype=model.grid.dtype),
        jnp.arange(model.grid_width, dtype=model.grid.dtype),
        indexing="ij",
    )
    return grid_to_pixel(model, jnp.stack([gx, gy], axis=-1))


def is_in_calibrated_area(model: CentralGenericModel, xy):
    return (
        (xy[..., 0] >= model.calibration_min_x)
        & (xy[..., 0] < model.calibration_max_x + 1)
        & (xy[..., 1] >= model.calibration_min_y)
        & (xy[..., 1] < model.calibration_max_y + 1)
    )


# ----------------------------- unprojection -----------------------------


def _eval_spline_and_jac(grid, gxy):
    """Spline value u (3,) and du/d(grid coords) (3, 2) at one point."""
    win, bx, by = bspline.gather_window_2d(grid, gxy[0], gxy[1])
    tx = gxy[0] - (bx + 1).astype(gxy.dtype)
    ty = gxy[1] - (by + 1).astype(gxy.dtype)
    wx = bspline.cubic_bspline_weights(tx)
    wy = bspline.cubic_bspline_weights(ty)
    dwx = bspline.cubic_bspline_weight_derivs(tx)
    dwy = bspline.cubic_bspline_weight_derivs(ty)
    u = jnp.einsum("i,j,ijc->c", wy, wx, win)
    du_dx = jnp.einsum("i,j,ijc->c", wy, dwx, win)
    du_dy = jnp.einsum("i,j,ijc->c", dwy, wx, win)
    return u, jnp.stack([du_dx, du_dy], axis=-1)


def _normalize_with_jac(u):
    """un = u/|u| and d un/d u = (I - un unᵀ)/|u|."""
    norm = jnp.linalg.norm(u)
    un = u / norm
    n_jac = (jnp.eye(3, dtype=u.dtype) - jnp.outer(un, un)) / norm
    return un, n_jac


def unproject_grid_coords(model: CentralGenericModel, gxy):
    """Unit direction at continuous grid coords (..., 2)."""
    flat = gxy.reshape(-1, 2)
    u = bspline.eval_surface_dense(model.grid, flat)
    un = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    return un.reshape(gxy.shape[:-1] + (3,))


def unproject(model: CentralGenericModel, xy):
    """Unproject pixel-corner coords (..., 2) -> (unit dirs (..., 3), valid).

    (reference: central_generic.h:97-105; validity = calibrated area)
    """
    dirs = unproject_grid_coords(model, pixel_to_grid(model, xy))
    return dirs, is_in_calibrated_area(model, xy)


def unproject_with_jacobian(model: CentralGenericModel, xy):
    """Unit dir + Jacobian wrt pixel coords for a single pixel (2,).

    (reference: central_generic.cc:521-549 UnprojectWithJacobian)
    """
    gxy = pixel_to_grid(model, xy)
    u, du_dg = _eval_spline_and_jac(model.grid, gxy)
    un, n_jac = _normalize_with_jac(u)
    sx, sy = pixel_scale_to_grid_scale(model)
    scale = jnp.asarray([sx, sy], dtype=xy.dtype)
    jac = (n_jac @ du_dg) * scale[None, :]
    return un, jac


# ------------------------------ projection ------------------------------


def pallas_projection_enabled(model: CentralGenericModel, dtype) -> bool:
    """Static switch for the fused Pallas projection kernels.

    True on TPU-like backends for f32 grids (the BA hot path); the XLA
    path remains the reference implementation and the only path on CPU
    (tests run f64 on CPU).  Override with CCT_PALLAS=0.
    """
    import os

    if os.environ.get("CCT_PALLAS", "1") == "0":
        return False
    if dtype != jnp.float32 or model.grid.dtype != jnp.float32:
        return False
    try:
        from camera_calibration_tpu.config import effective_backend

        return effective_backend() != "cpu"
    except Exception:  # pragma: no cover - backend probing never raises
        return False


def _static_clamp_bounds(model: CentralGenericModel):
    """Python-float mirror of _grid_clamp_bounds (for static kernel params)."""
    ex = model.calibration_max_x + 1 - model.calibration_min_x
    ey = model.calibration_max_y + 1 - model.calibration_min_y
    gw, gh = model.grid_width, model.grid_height

    def gx(px):
        return 1.0 + (gw - 3.0) * (px - model.calibration_min_x) / ex

    def gy(py):
        return 1.0 + (gh - 3.0) * (py - model.calibration_min_y) / ey

    lo = (gx(model.calibration_min_x), gy(model.calibration_min_y))
    hi = (gx(model.calibration_max_x + 0.999),
          gy(model.calibration_max_y + 0.999))
    return lo, hi


def _pad_rows(a, n_pad, fill):
    """Pad axis 0 of (n, k) to n_pad with a constant row."""
    n = a.shape[0]
    if n == n_pad:
        return a
    pad = jnp.broadcast_to(
        jnp.asarray(fill, a.dtype), (n_pad - n,) + a.shape[1:]
    )
    return jnp.concatenate([a, pad], axis=0)


def _grid_clamp_bounds(model: CentralGenericModel):
    """Clamp range for the projection test state, in grid coords.

    (reference clamps pixels to [min, max+0.999], central_generic.cc:478-481)
    """
    lo = pixel_to_grid(
        model,
        jnp.asarray(
            [model.calibration_min_x, model.calibration_min_y], model.grid.dtype
        ),
    )
    hi = pixel_to_grid(
        model,
        jnp.asarray(
            [model.calibration_max_x + 0.999, model.calibration_max_y + 0.999],
            model.grid.dtype,
        ),
    )
    return lo, hi


def project_directions(
    model: CentralGenericModel,
    dirs,
    init_xy=None,
    max_iterations: int = 50,
    eps: float | None = None,
):
    """Batched projection of unit directions (N, 3) -> pixel-corner (N, 2).

    Batched LM inversion of unprojection (reference semantics:
    central_generic.cc:433-519).  Returns (pixel_xy, grid_xy, valid).
    ``init_xy``: optional warm-start pixels (the reference's
    ProjectWithInitialEstimate / last_projection trick,
    joint_optimization.cc:325-343); defaults to the calibrated-area center.
    """
    dtype = model.grid.dtype
    dirs = dirs.astype(dtype)
    n = dirs.shape[0]
    if eps is None:
        eps = 1e-12 if dtype == jnp.float64 else 1e-10
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

    if pallas_projection_enabled(model, dtype):
        from camera_calibration_tpu.models import central_generic_pallas as cgp

        tile = 2048
        n_pad = -(-n // tile) * tile
        lo_s, hi_s = _static_clamp_bounds(model)
        center = (
            0.5 * (lo_s[0] + hi_s[0]), 0.5 * (lo_s[1] + hi_s[1])
        )
        dirs_p = _pad_rows(dirs, n_pad, (0.0, 0.0, 1.0))
        g_p = _pad_rows(g, n_pad, center)
        g_out, final_cost = cgp.project_grid_coords_pallas(
            model.grid, dirs_p, g_p, lo_s, hi_s,
            max_iterations=int(max_iterations), eps=float(eps), tile=tile,
        )
        g_out = g_out[:n]
        valid = final_cost[:n] < jnp.asarray(1e4 * eps, dtype)
        return grid_to_pixel(model, g_out), g_out, valid

    lo, hi = _grid_clamp_bounds(model)

    def dir_residual(g_pts):
        # dense one-hot spline eval: gathers become MXU contractions
        u, du = bspline.eval_surface_dense_with_jac(model.grid, g_pts)
        norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
        un = u / norm
        return un, du, norm

    def cost_at(g_pts):
        u = bspline.eval_surface_dense(model.grid, g_pts)
        un = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        return jnp.sum((un - dirs) ** 2, axis=-1)

    lam0 = jnp.full((n,), -1.0, dtype)

    def body(carry):
        it, g, lam, rejects, done = carry
        un, du, norm = dir_residual(g)
        # d un/d g = N(u) @ du with N = (I - un unᵀ)/|u|
        proj = du - un[..., :, None] * jnp.sum(un[..., :, None] * du, axis=-2, keepdims=True)
        jac = proj / norm[..., None]
        r = un - dirs
        cost = jnp.sum(r * r, axis=-1)
        h = jnp.einsum("nik,nil->nkl", jac, jac)
        b = jnp.einsum("nik,ni->nk", jac, r)
        mean_diag = 0.5 * (h[:, 0, 0] + h[:, 1, 1])
        lam = jnp.where(lam < 0, 0.01 * mean_diag, lam)
        h_damped = h + lam[:, None, None] * jnp.eye(2, dtype=dtype)
        step = solve2x2(h_damped, b)
        g_test = jnp.clip(g - step, lo, hi)
        test_cost = cost_at(g_test)
        accept = (test_cost < cost) & (~done)
        g = jnp.where(accept[:, None], g_test, g)
        lam = jnp.where(accept, 0.5 * lam, 2.0 * lam)
        # A point is finished when converged OR stalled (three consecutive
        # rejected steps — at a minimum every test step rejects, so this is
        # the convergence signal for points whose cost floor is above eps).
        # Warm-started already-optimal points then exit after ~3 iterations
        # inside the BA hot path instead of always running to the cap.
        rejects = jnp.where(accept, 0, rejects + 1)
        done = done | (cost < eps) | (rejects >= 3)
        return it + 1, g, lam, rejects, done

    def cond(carry):
        it, _, _, _, done = carry
        return (it < max_iterations) & (~jnp.all(done))

    _, g, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), g, lam0, jnp.zeros((n,), jnp.int32),
         jnp.zeros((n,), bool)),
    )
    final_cost = cost_at(g)
    # Converged = direction reproduced to high accuracy (=> sub-pixel exact).
    valid = final_cost < jnp.asarray(1e4 * eps, dtype)
    return grid_to_pixel(model, g), g, valid


def project_points(model: CentralGenericModel, points, init_xy=None, **kw):
    """Project camera-space 3D points (N, 3); normalizes then projects."""
    norms = jnp.linalg.norm(points, axis=-1, keepdims=True)
    dirs = points / jnp.maximum(norms, 1e-18)
    px, g, valid = project_directions(model, dirs, init_xy=init_xy, **kw)
    return px, g, valid & (norms[..., 0] > 1e-12)


# ----------------------- projection sensitivities -----------------------


def projection_sensitivities(model: CentralGenericModel, g_star):
    """Exact derivatives of the projection at converged grid coords g*.

    Implicit-function theorem at the projection optimum (residual
    un(g*) − d ≈ 0):  dg = (UᵀU)⁻¹ Uᵀ (dd − dun_θ)  with U = ∂un/∂g.

    Returns a dict per point (batched over leading axis of g_star (N, 2)):
      - ``pix_wrt_dir``   (N, 2, 3): d pixel / d target-direction.
      - ``pn``            (N, 2, 3): P·N(u) — d pixel / d(ambient knot k)
        equals ``-w_k · pn`` where ``w_k`` is the knot's spline weight.
      - ``weights``       (N, 4, 4): spline weights of the 4×4 window [y, x].
      - ``base_xy``       (N, 2) int32: window base indices (x, y).

    This replaces the reference's numeric 32-perturbation intrinsics
    Jacobian (central_grid.h:188-245) with closed form.
    """
    dtype = model.grid.dtype

    # fully batched: dense spline eval + closed-form normalize chain
    u, du = bspline.eval_surface_dense_with_jac(model.grid, g_star)  # (N,3),(N,3,2)
    norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    un = u / norm
    n_jac = (
        jnp.eye(3, dtype=dtype)[None] - jnp.einsum("ni,nj->nij", un, un)
    ) / norm[..., None]
    big_u = jnp.einsum("nij,njk->nik", n_jac, du)  # (N,3,2) = ∂un/∂g
    uu = jnp.einsum("nik,nil->nkl", big_u, big_u)  # (N,2,2)
    # P = (UᵀU)⁻¹ Uᵀ (N,2,3), via 2x2 solves against the rows of U.
    uu_inv_ut = jnp.swapaxes(
        solve2x2(jnp.broadcast_to(uu[:, None], uu.shape[:1] + (3, 2, 2)), big_u),
        -1,
        -2,
    )
    sx, sy = pixel_scale_to_grid_scale(model)
    inv_scale = jnp.asarray([1.0 / sx, 1.0 / sy], dtype)
    p_px = uu_inv_ut * inv_scale[None, :, None]
    pn = jnp.einsum("nik,nkl->nil", p_px, n_jac)

    base_x = jnp.floor(g_star[:, 0]).astype(jnp.int32) - 1
    base_y = jnp.floor(g_star[:, 1]).astype(jnp.int32) - 1
    tx = g_star[:, 0] - (base_x + 1).astype(dtype)
    ty = g_star[:, 1] - (base_y + 1).astype(dtype)
    wx = bspline.cubic_bspline_weights(tx)
    wy = bspline.cubic_bspline_weights(ty)
    weights = wy[:, :, None] * wx[:, None, :]  # (N,4,4) [y, x]
    base = jnp.stack([base_x, base_y], axis=-1)
    return {
        "pix_wrt_dir": p_px,
        "pn": pn,
        "weights": weights,
        "base_xy": base,
    }
