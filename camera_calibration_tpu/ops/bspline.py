"""Uniform cubic B-spline evaluation on regular grids.

Semantics match the reference engine's spline convention
(reference: applications/camera_calibration/src/camera_calibration/b_spline.h:46-104):
a value at continuous grid coordinate ``g`` is interpolated from the four
control points ``floor(g)-1 .. floor(g)+2`` using the standard uniform cubic
B-spline basis of the fractional part ``t = g - floor(g)``.  (The reference
expresses this by shifting by +2 and evaluating basis polynomials on [3,4);
algebraically identical.)

Everything here is pure jnp, shape-polymorphic, and vmap/jit friendly.
Gathers are expressed as dynamic gathers over the control-point array so
that batched evaluation lowers to one big XLA gather + dense contraction
(VPU/MXU friendly) instead of per-point loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cubic_bspline_weights(t):
    """Uniform cubic B-spline basis weights for fractional position t in [0,1).

    Returns an array w with shape t.shape + (4,) such that
    ``f(g) = sum_k w[k] * c[floor(g)-1+k]``.
    """
    t = jnp.asarray(t)
    t2 = t * t
    t3 = t2 * t
    one_m = 1.0 - t
    w0 = (one_m * one_m * one_m) / 6.0
    w1 = (3.0 * t3 - 6.0 * t2 + 4.0) / 6.0
    w2 = (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0) / 6.0
    w3 = t3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def cubic_bspline_weight_derivs(t):
    """d/dt of cubic_bspline_weights (per unit grid coordinate)."""
    t = jnp.asarray(t)
    t2 = t * t
    one_m = 1.0 - t
    d0 = -(one_m * one_m) / 2.0
    d1 = (9.0 * t2 - 12.0 * t) / 6.0
    d2 = (-9.0 * t2 + 6.0 * t + 3.0) / 6.0
    d3 = t2 / 2.0
    return jnp.stack([d0, d1, d2, d3], axis=-1)


def window_base(g):
    """Index of the first of the 4 control points used at grid coordinate g.

    base = floor(g) - 1; the window is base .. base+3.
    """
    return jnp.floor(g).astype(jnp.int32) - 1


def gather_window_2d(grid, gx, gy):
    """Gather the 4x4 control-point window around (gx, gy).

    grid: (H, W, C) control points (y-major like an image).
    gx, gy: scalars (vmap for batches).
    Returns (window (4,4,C) [y, x, C], base_x, base_y).
    """
    bx = window_base(gx)
    by = window_base(gy)
    win = jax.lax.dynamic_slice(
        grid, (by, bx, jnp.zeros((), by.dtype)), (4, 4, grid.shape[-1])
    )
    return win, bx, by


def eval_window(window, tx, ty):
    """Evaluate the spline surface given a 4x4(xC) window and fractional coords."""
    wx = cubic_bspline_weights(tx)
    wy = cubic_bspline_weights(ty)
    return jnp.einsum("i,j,ijc->c", wy, wx, window)


def eval_surface(grid, gx, gy):
    """Evaluate a cubic B-spline surface at continuous grid coords (gx, gy).

    grid: (H, W, C); gx in [1, W-2), gy in [1, H-2) for a fully valid window.
    Returns (C,). vmap over gx/gy for batches.
    """
    win, bx, by = gather_window_2d(grid, gx, gy)
    tx = gx - (bx + 1).astype(gx.dtype)
    ty = gy - (by + 1).astype(gy.dtype)
    return eval_window(win, tx, ty)


def eval_window_fixed_base(window, bx, by, gx, gy):
    """Evaluate using a pre-gathered window whose base indices are fixed.

    Used for implicit differentiation of projection: the window stays pinned
    while (gx, gy) move differentiably (the polynomial extrapolates smoothly
    slightly outside the nominal cell).
    """
    tx = gx - (bx + 1).astype(gx.dtype)
    ty = gy - (by + 1).astype(gy.dtype)
    return eval_window(window, tx, ty)


def eval_surface_batched(grid, gxy):
    """Batched surface evaluation. gxy: (N, 2) -> (N, C)."""
    return jax.vmap(lambda p: eval_surface(grid, p[0], p[1]))(gxy)


# ----------------------- dense batched evaluation -----------------------
#
# TPU-native fast path: instead of per-point window gathers (vmapped
# dynamic_slice lowers to slow scalarized gathers on TPU), place the four
# cubic weights into a dense (N, size) row per axis and contract with the
# whole control grid — gathers become MXU matmuls.  Measured ~50× faster
# for the projection inner loop at 262k points on a v5e chip.


def dense_axis_weights(g, size, derivative=False):
    """Dense per-axis weight rows (N, size) for grid coords g (N,).

    Row n holds the 4 cubic B-spline weights of point n at columns
    base..base+3 (zeros elsewhere).
    """
    base = jnp.floor(g).astype(jnp.int32) - 1
    t = g - (base + 1).astype(g.dtype)
    w4 = (
        cubic_bspline_weight_derivs(t) if derivative else cubic_bspline_weights(t)
    )  # (N, 4)
    idx = base[:, None] + jnp.arange(4, dtype=base.dtype)[None, :]  # (N,4)
    iota = jnp.arange(size, dtype=base.dtype)
    onehot = (iota[None, None, :] == idx[:, :, None]).astype(g.dtype)
    return jnp.einsum("nks,nk->ns", onehot, w4)


def eval_surface_dense_rows(grid, wx, wy):
    """Dense surface eval from PRECOMPUTED per-axis weight rows.

    grid: (H, W, C); wx: (N, W); wy: (N, H) -> (N, C).  Callers with
    fixed sample coordinates precompute wx/wy once and reuse them across
    solver iterations (models/fit.py).
    """
    rows = jnp.einsum("nh,hwc->nwc", wy, grid)
    return jnp.einsum("nw,nwc->nc", wx, rows)


def eval_surface_dense(grid, gxy):
    """Batched surface eval via dense weight contraction.

    grid: (H, W, C); gxy: (N, 2) -> (N, C).
    """
    h, w = grid.shape[:2]
    wx = dense_axis_weights(gxy[:, 0], w)
    wy = dense_axis_weights(gxy[:, 1], h)
    return eval_surface_dense_rows(grid, wx, wy)


def eval_surface_dense_with_jac(grid, gxy):
    """Batched (value (N,C), d value/d grid coords (N,C,2))."""
    h, w = grid.shape[:2]
    wx = dense_axis_weights(gxy[:, 0], w)
    wy = dense_axis_weights(gxy[:, 1], h)
    dwx = dense_axis_weights(gxy[:, 0], w, derivative=True)
    dwy = dense_axis_weights(gxy[:, 1], h, derivative=True)
    rows = jnp.einsum("nh,hwc->nwc", wy, grid)
    drows = jnp.einsum("nh,hwc->nwc", dwy, grid)
    val = jnp.einsum("nw,nwc->nc", wx, rows)
    du_dx = jnp.einsum("nw,nwc->nc", dwx, rows)
    du_dy = jnp.einsum("nw,nwc->nc", wx, drows)
    return val, jnp.stack([du_dx, du_dy], axis=-1)


# ------------------------------- 1D spline -------------------------------


def eval_1d(knots, g):
    """Evaluate a 1D cubic B-spline with control points `knots` (K,) at g.

    Window is floor(g)-1 .. floor(g)+2 (same convention as the surface).
    """
    b = window_base(g)
    win = jax.lax.dynamic_slice(knots, (b,), (4,))
    t = g - (b + 1).astype(g.dtype)
    w = cubic_bspline_weights(t)
    return jnp.dot(w, win)
