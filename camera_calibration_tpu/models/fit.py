"""Fitting camera models to dense per-pixel observation-direction images.

Capability parity with the reference's FitToDenseModel for grid models
(reference: applications/camera_calibration/src/camera_calibration/models/
central_generic.cc:267-418): knots are seeded from the nearest valid dense
pixel (ring search, then iterative neighbor extrapolation for holes), then
all knots are refined by nonlinear least squares against subsampled
directions with 2-DoF-per-knot manifold updates.

Seeding is host-side NumPy (irregular hole-filling is control-flow heavy);
refinement is the jitted matrix-free LM engine (ba/gn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.ba.gn import lm_solve
from camera_calibration_tpu.config import host_device_ctx as _host_device_ctx
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models.base import replace
from camera_calibration_tpu.ops import bspline, manifolds


def _fit_device_ctx(dtype):
    """Device context for the sample-LM refinement: CPU-pinned.

    Measured both ways on the remote-TPU machine: a warm standalone
    chunked fit runs 1.6 s on the chip vs 12 s on CPU, but through the
    pipeline each fit is a fresh shape (trace + cache-load per chunk
    program) and the remote dispatch weather (2-20× session variance)
    ate the win — the CPU-pinned pipeline measured fastest end to end
    (172.9 s vs 210+ s).  Revisit if the runtime's dispatch latency
    stabilizes; _chunked_lm already bounds per-program duration for a
    future accelerator path.
    """
    return _host_device_ctx()


import functools


@functools.lru_cache(maxsize=64)
def _fit_chunk_jit(k_tangent: int, normalize: bool, chunk: int,
                   cg_iterations: int):
    """Shape-cached jitted LM chunk for the dense-rows fit residual.

    The sample data (wx, wy, target) are ARGUMENTS, not closure
    constants: closed-over arrays embed into the jaxpr as constants,
    which keys the compilation cache on their VALUES — every fit in a
    pipeline then recompiled every chunk on the remote chip (measured:
    the closure form made the TPU fit slower than the CPU one).
    """

    @jax.jit
    def run(grid0, lam0, wx, wy, target):
        gh, gw = grid0.shape[:2]

        def residual_fn(grid):
            vals = bspline.eval_surface_dense_rows(grid, wx, wy)
            if normalize:
                vals = vals / jnp.linalg.norm(vals, axis=-1, keepdims=True)
            return (vals - target).reshape(-1)

        def retract_fn(grid, tangent):
            if normalize:
                return manifolds.retract_direction(grid, tangent)
            return grid + tangent

        res = lm_solve(
            residual_fn, retract_fn, grid0,
            jnp.zeros((gh, gw, k_tangent), grid0.dtype),
            max_iterations=chunk, cg_iterations=cg_iterations, lam0=lam0,
        )
        return res.state, res.iterations, res.lam

    return run


def _chunked_lm(x0, wx, wy, target, *, normalize, k_tangent, max_iterations,
                cg_iterations, chunk: int = 5):
    """LM in duration-bounded device dispatches, carrying (state, λ).

    Equivalent to one lm_solve call with max_iterations, but no single
    device program runs more than ``chunk`` LM iterations — the remote
    TPU runtime kills programs past ~2 minutes (see RESULTS.md).  On the
    CPU backend the bound is irrelevant, so one full-length call avoids
    the extra dispatches.
    """
    from camera_calibration_tpu.config import effective_backend

    if effective_backend() == "cpu":
        chunk = max_iterations
    lam = jnp.asarray(-1.0, x0.dtype)
    it_total = 0
    x = x0
    while it_total < max_iterations:
        k = min(chunk, max_iterations - it_total)
        step = _fit_chunk_jit(k_tangent, normalize, k, cg_iterations)
        x, it_arr, lam = step(x, lam, wx, wy, target)
        it = int(it_arr)
        it_total += it
        if it < k:  # converged or stalled inside the chunk
            break
    return x


def _linear_kron_solve(wx, wy, target, seed, ridge: float = 1e-6,
                       normalize: bool = True):
    """Solve knots minimizing ‖(wy⊗wx)·G − target‖² + ridge anchoring.

    wx (N, gw) / wy (N, gh) B-spline weight rows; target (N, C); seed
    (gh, gw, C) anchors knots with no data support (the kron normal
    matrix is singular there without it).  Host NumPy — the normal
    matrix is at most a few hundred square.
    """
    n = wx.shape[0]
    gh, gw = wy.shape[1], wx.shape[1]
    a = (wy[:, :, None] * wx[:, None, :]).reshape(n, gh * gw)
    lam = ridge * max(1.0, n / (gh * gw))
    h = a.T @ a + lam * np.eye(gh * gw)
    rhs = a.T @ np.asarray(target) + lam * np.asarray(seed).reshape(
        gh * gw, -1
    )
    g = np.linalg.solve(h, rhs).reshape(gh, gw, -1)
    if normalize:
        g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    return g


def _seed_grid_from_dense(dense_dirs, valid, model):
    """Initialize each knot direction from the dense direction image.

    dense_dirs: (H, W, 3) np array; valid: (H, W) bool.
    Mirrors the reference's nearest-valid-pixel ring search (r < 5) with
    iterative neighbor extrapolation for the remaining holes
    (central_generic.cc:267-341 semantics).
    """
    h, w = valid.shape
    gh, gw = model.grid_height, model.grid_width
    # host-pinned: these tiny eager ops otherwise dispatch (and compile)
    # on the remote accelerator at ~0.25 s each (measured 5.1 s/fit)
    with _host_device_ctx():
        knot_px = np.asarray(cg.grid_point_pixels(model))
    grid = np.zeros((gh, gw, 3), np.float64)
    filled = np.zeros((gh, gw), bool)

    vy, vx = np.nonzero(valid)
    for gy in range(gh):
        for gx in range(gw):
            px = knot_px[gy, gx]
            cx = int(np.clip(np.floor(px[0]), 0, w - 1))
            cy = int(np.clip(np.floor(px[1]), 0, h - 1))
            found = False
            for r in range(5):
                x0, x1 = max(0, cx - r), min(w - 1, cx + r)
                y0, y1 = max(0, cy - r), min(h - 1, cy + r)
                sub = valid[y0 : y1 + 1, x0 : x1 + 1]
                if sub.any():
                    yy, xx = np.nonzero(sub)
                    d2 = (yy + y0 - cy) ** 2 + (xx + x0 - cx) ** 2
                    i = np.argmin(d2)
                    grid[gy, gx] = dense_dirs[yy[i] + y0, xx[i] + x0]
                    filled[gy, gx] = True
                    found = True
                    break
            if not found:
                pass  # fill by extrapolation below
    # Iterative neighbor-mean extrapolation for unfilled knots.
    while not filled.all():
        newly = np.zeros_like(filled)
        acc = np.zeros((gh, gw, 3))
        cnt = np.zeros((gh, gw))
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = np.roll(filled, (dy, dx), (0, 1))
            vals = np.roll(grid, (dy, dx), (0, 1))
            # zero out wrap-around
            if dy == 1:
                shifted[0, :] = False
            elif dy == -1:
                shifted[-1, :] = False
            if dx == 1:
                shifted[:, 0] = False
            elif dx == -1:
                shifted[:, -1] = False
            m = shifted & ~filled
            acc[m] += vals[m]
            cnt[m] += 1
        m = (cnt > 0) & ~filled
        if not m.any():
            # disconnected: fill remaining with forward axis
            grid[~filled] = np.array([0.0, 0.0, 1.0])
            filled[:] = True
            break
        grid[m] = acc[m] / cnt[m][:, None]
        newly |= m
        filled |= m
    norms = np.linalg.norm(grid, axis=-1, keepdims=True)
    return grid / np.maximum(norms, 1e-12)


def fit_central_generic_to_dense(
    dense_dirs,
    valid,
    grid_resolution,
    *,
    width=None,
    height=None,
    calibration_min_x=0,
    calibration_min_y=0,
    calibration_max_x=None,
    calibration_max_y=None,
    max_sample_count: int = 12000,
    max_iterations: int = 30,
    cg_iterations: int = 60,
    dtype=jnp.float64,
    linear_init: bool = True,
):
    """Fit a CentralGenericModel to a dense (H, W, 3) direction image.

    Returns the fitted model.  (reference: central_generic.cc:267-418)
    max_sample_count 12k keeps ≥20 samples per knot cell at VGA with the
    default ~25 px/cell grids while running 3× faster than the previous
    40k (fit quality saturates f32 well below both).
    """
    dense_dirs = np.asarray(dense_dirs, np.float64)
    valid = np.asarray(valid, bool)
    h, w = valid.shape
    width = w if width is None else width
    height = h if height is None else height
    if calibration_max_x is None:
        calibration_max_x = width - 1
    if calibration_max_y is None:
        calibration_max_y = height - 1
    gh, gw = grid_resolution if isinstance(grid_resolution, tuple) else (
        grid_resolution,
        grid_resolution,
    )
    model = cg.CentralGenericModel(
        grid=jnp.zeros((gh, gw, 3), dtype),
        width=int(width),
        height=int(height),
        calibration_min_x=int(calibration_min_x),
        calibration_min_y=int(calibration_min_y),
        calibration_max_x=int(calibration_max_x),
        calibration_max_y=int(calibration_max_y),
    )
    grid0 = _seed_grid_from_dense(dense_dirs, valid, model)

    # Subsample valid pixels for the refinement.
    vy, vx = np.nonzero(valid)
    n_valid = vy.size
    stride = max(1, n_valid // max_sample_count)
    sel = np.arange(0, n_valid, stride)
    px = np.stack([vx[sel] + 0.5, vy[sel] + 0.5], -1).astype(np.float64)
    target_np = dense_dirs[vy[sel], vx[sel]]
    target_np /= np.linalg.norm(target_np, axis=-1, keepdims=True)

    # The residual uses the DENSE weight-row contraction (sample weights
    # are constants of the fixed sample coords, precomputed once):
    # per-sample window gathers execute orders of magnitude below vector
    # speed on every backend.  The solve runs CPU-pinned in shape-cached
    # jitted chunks (_fit_device_ctx/_chunked_lm explain the measured
    # device trade-offs).
    with _fit_device_ctx(dtype):
        model = replace(model, grid=jnp.asarray(grid0, dtype))
        gxy = cg.pixel_to_grid(model, jnp.asarray(px, dtype))
        target = jnp.asarray(target_np, dtype)
        wx = bspline.dense_axis_weights(gxy[:, 0], gw)  # (N, gw)
        wy = bspline.dense_axis_weights(gxy[:, 1], gh)  # (N, gh)

        # Linear least-squares init: without the unit-norm constraint the
        # spline fit is LINEAR in the knots, so one kron normal-equation
        # solve (ridge-anchored to the ring-seeded grid for knots outside
        # data support) lands within the LM's convergence basin — the LM
        # then terminates in a handful of iterations instead of burning
        # its full budget from the crude nearest-pixel seed.  Measured on
        # a VGA init fit (21x16 grid, 12k samples): 10.0 s / 7.7e-4 deg
        # median -> 0.6 s linear with 6.6e-4 deg; the polish keeps the
        # coarse-grid case (where normalization bites) at parity.
        if linear_init:
            grid_start = jnp.asarray(_linear_kron_solve(
                np.asarray(wx), np.asarray(wy), target_np, grid0
            ), dtype)
            lm_budget = min(max_iterations, 8)
        else:
            # conservative path kept for noisy fields whose downstream
            # consumers are tuned to the capped-CG LM trajectory (the
            # noncentral line-field fit regressed with the LSQ start)
            grid_start = model.grid
            lm_budget = max_iterations
        grid_fit = _chunked_lm(
            grid_start, wx, wy, target,
            normalize=True, k_tangent=2,
            max_iterations=lm_budget,
            cg_iterations=cg_iterations,
        )
        grid_np = np.asarray(grid_fit)
    # return UNCOMMITTED arrays on the default backend so downstream BA
    # is free to run on the accelerator
    return replace(model, grid=jnp.asarray(grid_np, dtype))


def _seed_values_from_dense(dense_vals, valid, model):
    """Knot seeding for an arbitrary-valued field (nearest valid pixel +
    neighbor-mean extrapolation, no normalization)."""
    h, w = valid.shape
    gh, gw = model.grid_height, model.grid_width
    with _host_device_ctx():
        knot_px = np.asarray(cg.grid_point_pixels(model))
    grid = np.zeros((gh, gw, dense_vals.shape[-1]), np.float64)
    filled = np.zeros((gh, gw), bool)
    for gy in range(gh):
        for gx in range(gw):
            px = knot_px[gy, gx]
            cx = int(np.clip(np.floor(px[0]), 0, w - 1))
            cy = int(np.clip(np.floor(px[1]), 0, h - 1))
            for r in range(5):
                x0, x1 = max(0, cx - r), min(w - 1, cx + r)
                y0, y1 = max(0, cy - r), min(h - 1, cy + r)
                sub = valid[y0:y1 + 1, x0:x1 + 1]
                if sub.any():
                    yy, xx = np.nonzero(sub)
                    d2 = (yy + y0 - cy) ** 2 + (xx + x0 - cx) ** 2
                    i = np.argmin(d2)
                    grid[gy, gx] = dense_vals[yy[i] + y0, xx[i] + x0]
                    filled[gy, gx] = True
                    break
    while not filled.all():
        acc = np.zeros_like(grid)
        cnt = np.zeros((gh, gw))
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = np.roll(filled, (dy, dx), (0, 1))
            vals = np.roll(grid, (dy, dx), (0, 1))
            if dy == 1:
                shifted[0, :] = False
            elif dy == -1:
                shifted[-1, :] = False
            if dx == 1:
                shifted[:, 0] = False
            elif dx == -1:
                shifted[:, -1] = False
            m = shifted & ~filled
            acc[m] += vals[m]
            cnt[m] += 1
        m = (cnt > 0) & ~filled
        if not m.any():
            filled[:] = True
            break
        grid[m] = acc[m] / cnt[m][:, None]
        filled |= m
    return grid


def fit_noncentral_to_lines(
    line_dirs,
    line_anchors,
    valid,
    grid_resolution,
    *,
    width=None,
    height=None,
    max_sample_count: int = 12000,
    max_iterations: int = 30,
    cg_iterations: int = 60,
    dtype=jnp.float64,
):
    """Fit a NoncentralGenericModel to a dense per-pixel line field.

    line_dirs / line_anchors: (H, W, 3) oriented unit directions and line
    anchor points (choose anchors that vary smoothly, e.g. closest points
    to the effective camera centroid — see init/noncentral_init.py).

    The reference has no such fit — its noncentral models always start
    from a central model with zero origins (our models/noncentral_generic.
    from_central matches that path); this fit enables the full
    noncentral-from-scratch initialization.
    """
    from camera_calibration_tpu.models import noncentral_generic as ncg

    line_dirs = np.asarray(line_dirs, np.float64)
    line_anchors = np.asarray(line_anchors, np.float64)
    valid = np.asarray(valid, bool)
    h, w = valid.shape
    width = w if width is None else width
    height = h if height is None else height

    # Fit in the field's own raster, rewrap with the real image bounds at
    # the end (the buffer covers the full image uniformly).
    central = fit_central_generic_to_dense(
        line_dirs, valid, grid_resolution,
        width=w, height=h,
        max_sample_count=max_sample_count,
        max_iterations=max_iterations,
        cg_iterations=cg_iterations,
        dtype=dtype,
        linear_init=False,  # see note above the anchor fit below
    )

    gh, gw = central.grid.shape[:2]
    probe = cg.CentralGenericModel(
        grid=jnp.zeros((gh, gw, 3), dtype),
        width=w, height=h,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=w - 1, calibration_max_y=h - 1,
    )
    point0 = _seed_values_from_dense(line_anchors, valid, probe)

    vy, vx = np.nonzero(valid)
    stride = max(1, vy.size // max_sample_count)
    sel = np.arange(0, vy.size, stride)
    px = np.stack([vx[sel] + 0.5, vy[sel] + 0.5], -1).astype(np.float64)

    # dense weight-row residual + device policy as in
    # fit_central_generic_to_dense above.  NOTE: although the anchor fit
    # has no normalization constraint (linear LSQ), the capped-CG LM is
    # kept deliberately — its early termination acts as implicit
    # smoothing of the weakly-constrained along-ray anchor directions,
    # and the exact LSQ optimum measurably degrades the downstream BA
    # basin (noncentral seed-robustness E2E regressed past its 0.01 px
    # gate when this was switched to the closed-form solve).
    with _fit_device_ctx(dtype):
        target = jnp.asarray(line_anchors[vy[sel], vx[sel]], dtype)
        gxy = cg.pixel_to_grid(probe, jnp.asarray(px, dtype))
        wx = bspline.dense_axis_weights(gxy[:, 0], gw)
        wy = bspline.dense_axis_weights(gxy[:, 1], gh)

        point_fit = _chunked_lm(
            jnp.asarray(point0, dtype), wx, wy, target,
            normalize=False, k_tangent=3,
            max_iterations=max_iterations,
            cg_iterations=cg_iterations,
        )
        point_np = np.asarray(point_fit)
    return ncg.NoncentralGenericModel(
        direction_grid=central.grid,
        point_grid=jnp.asarray(point_np, dtype),
        width=int(width), height=int(height),
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=int(width) - 1,
        calibration_max_y=int(height) - 1,
    )
