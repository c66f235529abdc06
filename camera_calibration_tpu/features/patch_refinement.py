"""Patch-resident corner refinement — the TPU-native fast path.

The reference's CUDA refinement keeps each feature's image window in
shared memory and runs 30 LM iterations per thread block (reference:
applications/camera_calibration/src/camera_calibration/feature_detection/
cuda_refinement_by_symmetry.cu:539, cuda_refinement_by_matching.cu).  The
TPU-native equivalent here avoids random-access image gathers entirely —
the one workload shape TPUs dislike (round-1 measurement: 380 features/s
gather-bound):

- a small square patch around every feature is extracted once (host-side
  fancy indexing — one strided copy);
- bilinear sampling *inside* a patch is expressed through linear
  B-spline ("hat") weight matrices contracted against the patch rows:
  ``val = rowsum(Wy ⊙ (Wx @ patchᵀ))`` with ``Wx[s,j] = max(0, 1−|x_s−j|)``
  — batched (N,S,P)×(N,P,P) matmuls on the MXU, no gathers, no
  data-dependent indexing, static shapes;
- spatial derivatives reuse the same contractions with the exact
  piecewise-constant hat derivative, matching floor-based bilinear
  interpolation (ops/interp.py) bit-for-bit in exact arithmetic.

Semantics (residuals, LM accept/reject, divergence checks) match
features/refinement.py, which remains the whole-image fallback (used for
gradient-pair refinement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from camera_calibration_tpu.ops import linalg
import numpy as np


def patch_size_for_window(window_half_size: int) -> int:
    """Patch edge covering window samples (±whs), LM drift (<whs) and the
    matching stage's coarse search (±3 px), rounded up for TPU sublanes."""
    p = 2 * (2 * window_half_size + 5) + 2
    return ((p + 7) // 8) * 8


def patch_origins(image_shape, centers: np.ndarray, patch: int):
    """Integer top-left origins of patches around float centers, clamped so
    every patch lies fully inside the image.  Returns (x0, y0) int64."""
    h, w = image_shape
    half = (patch - 2) // 2
    c = np.nan_to_num(np.asarray(centers), nan=0.0, posinf=0.0, neginf=0.0)
    x0 = np.clip(np.round(c[:, 0]).astype(np.int64) - half, 0, w - patch)
    y0 = np.clip(np.round(c[:, 1]).astype(np.int64) - half, 0, h - patch)
    return x0, y0


def extract_patches_host(image: np.ndarray, centers: np.ndarray, patch: int):
    """Extract (N, P, P) patches around float centers from a host image.

    One sliding-window fancy-index; the patch grid is aligned so that
    patch-local coords are image coords minus origin.
    Returns (patches (N,P,P) float, origins (N,2) float64).
    """
    x0, y0 = patch_origins(image.shape, centers, patch)
    windows = np.lib.stride_tricks.sliding_window_view(image, (patch, patch))
    patches = np.ascontiguousarray(windows[y0, x0])
    origins = np.stack([x0, y0], axis=-1).astype(np.float64)
    return patches, origins


@partial(jax.jit, static_argnames=("patch",))
def extract_patches_device(image, y0x0, patch: int):
    """Extract (N, P, P) patches from a device-resident image.

    vmapped dynamic_slice — one fused slice-gather per call, OUTSIDE the LM
    loop (measured 33 ms for 2048×56² from 1280×1024 on a v5e).  A Pallas
    per-feature DMA was tried and rejected: Mosaic requires dynamic HBM
    slice offsets to be tile-aligned (8 sublanes × 128 lanes), which patch
    origins are not.  y0x0: (N, 2) int32 (row, col) origins pre-clamped to
    [0, H−P]×[0, W−P] (see patch_origins)."""

    def one(o):
        return jax.lax.dynamic_slice(image, (o[0], o[1]), (patch, patch))

    return jax.vmap(one)(y0x0)


def _hat_weights(coord, size, dtype):
    """Hat value + derivative weight rows for 1D linear interpolation.

    coord (..., ) → (w (..., size), dw (..., size)); dw matches the
    right-continuous derivative of floor-based bilinear interpolation.
    """
    idx = jnp.arange(size, dtype=dtype)
    d = coord[..., None] - idx
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    dw = jnp.where(
        (d >= 0.0) & (d < 1.0),
        -1.0,
        jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0),
    )
    return w, dw


def sample_patches(patches, xy, with_grad: bool = True):
    """Bilinear patch sampling via hat-weight MXU contractions.

    patches (N, P, P) [row=y, col=x]; xy (N, S, 2) patch-local pixel-center
    coords.  Returns (val (N,S), grad (N,S,2) | None, valid (N,S)).
    """
    n, p, _ = patches.shape
    dtype = patches.dtype
    x = xy[..., 0]
    y = xy[..., 1]
    valid = (x >= 0.0) & (x <= p - 1.0) & (y >= 0.0) & (y <= p - 1.0)
    xc = jnp.clip(x, 0.0, p - 1.0)
    yc = jnp.clip(y, 0.0, p - 1.0)
    wx, dwx = _hat_weights(xc, p, dtype)
    wy, dwy = _hat_weights(yc, p, dtype)
    # T[n,s,q] = Σ_p wx[n,s,p] · patch[n,q,p]   (q = row index)
    # precision HIGH (3 bf16 passes, ~2^-16 rel) instead of the package
    # default HIGHEST (6 passes): the contraction is 26 GFLOP per LM
    # iteration at detector batch sizes and dominates the kernel; the
    # refinement's measured bias (~0.02 px) sits far above the 1e-5
    # sampling error HIGH introduces.
    t = jnp.einsum("nsp,nqp->nsq", wx, patches,
                   precision=jax.lax.Precision.HIGH)
    val = jnp.sum(wy * t, axis=-1)
    if not with_grad:
        return val, None, valid
    tdx = jnp.einsum("nsp,nqp->nsq", dwx, patches,
                     precision=jax.lax.Precision.HIGH)
    gx = jnp.sum(wy * tdx, axis=-1)
    gy = jnp.sum(dwy * t, axis=-1)
    return val, jnp.stack([gx, gy], axis=-1), valid


def _apply_h(h, pts):
    """Apply homographies (N,3,3) to points (N,S,2) -> (N,S,2)."""
    x = pts[..., 0]
    y = pts[..., 1]
    px = h[:, None, 0, 0] * x + h[:, None, 0, 1] * y + h[:, None, 0, 2]
    py = h[:, None, 1, 0] * x + h[:, None, 1, 1] * y + h[:, None, 1, 2]
    pw = h[:, None, 2, 0] * x + h[:, None, 2, 1] * y + h[:, None, 2, 2]
    safe = jnp.where(jnp.abs(pw) > 1e-12, pw, 1e-12)
    return jnp.stack([px / safe, py / safe], axis=-1)


@partial(jax.jit, static_argnames=("num_iterations",))
def refine_symmetry_patches(
    patches,
    origins,
    positions,
    pixel_tr_pattern,
    pattern_samples,
    sample_valid,
    window_half_size,
    num_iterations: int = 30,
):
    """Batched 8-DoF symmetry refinement on per-feature patches.

    Same optimization as refinement.refine_features_symmetry (single
    channel; reference cpu_refinement_by_symmetry.h:41-180 /
    cuda_refinement_by_symmetry.cu:539), with all image access replaced by
    patch-resident hat-weight contractions.  All coordinates (positions,
    homographies) stay in image space; `origins` maps into patch space.

    Returns (positions (N,2), final_cost (N,), converged (N,) bool).
    """
    n, s, _ = pattern_samples.shape
    dtype = patches.dtype

    h0 = pixel_tr_pattern
    h0 = h0.at[:, 0, 2].set(positions[:, 0] * h0[:, 2, 2])
    h0 = h0.at[:, 1, 2].set(positions[:, 1] * h0[:, 2, 2])
    h0 = h0 / h0[:, 2:3, 2:3]

    sm = sample_valid.astype(dtype)
    # Both mirror sides share one sample axis so every contraction runs at
    # 2S width (better MXU utilization than two S-wide passes).
    s_all = jnp.concatenate([pattern_samples, -pattern_samples], axis=1)
    sm2 = jnp.concatenate([sm, sm], axis=1)
    valid2 = jnp.concatenate([sample_valid, sample_valid], axis=1)

    def sample_sides(h, with_grad):
        pos = _apply_h(h, s_all) - origins[:, None, :]
        val, grad, ok = sample_patches(patches, pos, with_grad=with_grad)
        return val, grad, ok & valid2 | ~valid2

    def cost_of(h):
        val, _, ok = sample_sides(h, with_grad=False)
        ok_both = ok[:, :s] & ok[:, s:]
        r = val[:, :s] - val[:, s:]
        w = sm * ok_both.astype(dtype)
        cost = jnp.sum(r * r * w, axis=1)
        valid_all = jnp.all(ok_both | ~sample_valid, axis=1)
        return jnp.where(valid_all, cost, jnp.inf)

    def h_and_b(h):
        val, grad, ok = sample_sides(h, with_grad=True)
        x = s_all[..., 0]
        y = s_all[..., 1]
        denom = h[:, None, 2, 0] * x + h[:, None, 2, 1] * y + 1.0
        t0 = 1.0 / denom
        t1 = -t0 * t0
        num_x = h[:, None, 0, 0] * x + h[:, None, 0, 1] * y + h[:, None, 0, 2]
        num_y = h[:, None, 1, 0] * x + h[:, None, 1, 1] * y + h[:, None, 1, 2]
        t2 = num_x * t1
        t3 = num_y * t1
        zeros = jnp.zeros_like(x)
        row0 = jnp.stack(
            [x * t0, y * t0, t0, zeros, zeros, zeros, x * t2, y * t2], -1
        )
        row1 = jnp.stack(
            [zeros, zeros, zeros, x * t0, y * t0, t0, x * t3, y * t3], -1
        )
        pwh = jnp.stack([row0, row1], axis=-2)  # (N,2S,2,8)
        jac_all = jnp.einsum("nsd,nsdk->nsk", grad, pwh)  # (N,2S,8)
        jac = jac_all[:, :s] - jac_all[:, s:]
        r = val[:, :s] - val[:, s:]
        ok_both = ok[:, :s] & ok[:, s:]
        w = sm * ok_both.astype(dtype)
        big_h = jnp.einsum("nsj,nsk,ns->njk", jac, jac, w)
        b = jnp.einsum("nsj,ns->nj", jac, r * w)
        cost = jnp.sum(r * r * w, axis=1)
        valid = jnp.all(ok_both | ~sample_valid, axis=1)
        return big_h, b, jnp.where(valid, cost, jnp.inf), valid

    def body(carry, _):
        h, lam, best_cost, active = carry
        big_h, b, cost, valid = h_and_b(h)
        diag_mean = jnp.trace(big_h, axis1=-2, axis2=-1) / 8.0
        lam = jnp.where(lam < 0, 1e-3 * diag_mean, lam)
        h_lm = big_h + lam[:, None, None] * jnp.eye(8, dtype=dtype)
        step = linalg.cholesky_solve_small(h_lm, b)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        upd = step.reshape(-1, 8)
        h_test = h - jnp.concatenate(
            [upd, jnp.zeros((upd.shape[0], 1), dtype)], axis=1
        ).reshape(-1, 3, 3)
        test_cost = cost_of(h_test)
        accept = (test_cost < cost) & active & valid
        h = jnp.where(accept[:, None, None], h_test, h)
        lam = jnp.where(accept, 0.5 * lam, 2.0 * lam)
        best_cost = jnp.minimum(best_cost, jnp.where(valid, cost, jnp.inf))
        best_cost = jnp.where(accept, test_cost, best_cost)
        out_pos = h[:, 0:2, 2]
        diverged = jnp.any(
            jnp.abs(out_pos - positions) >= window_half_size, axis=-1
        )
        active = active & ~diverged & valid
        return (h, lam, best_cost, active), None

    lam0 = jnp.full((n,), -1.0, dtype)
    active0 = jnp.ones((n,), bool)
    best0 = jnp.full((n,), jnp.inf, dtype)
    (h, lam, best_cost, active), _ = jax.lax.scan(
        body, (h0, lam0, best0, active0), None, length=num_iterations
    )
    out_pos = h[:, 0:2, 2]
    converged = active & jnp.isfinite(best_cost)
    return out_pos, best_cost, converged


def _origins_in_jit(image_shape, centers, patch: int):
    """Traced patch origins (jnp mirror of patch_origins)."""
    h, w = image_shape
    half = (patch - 2) // 2
    c = jnp.nan_to_num(centers)
    x0 = jnp.clip(jnp.round(c[:, 0]).astype(jnp.int32) - half, 0, w - patch)
    y0 = jnp.clip(jnp.round(c[:, 1]).astype(jnp.int32) - half, 0, h - patch)
    return x0, y0


def _extract_indexed(image, image_idx, y0, x0, patch: int):
    """Patch extraction from a single image (H, W) or, when ``image`` is a
    stacked (B, H, W) dataset batch, from per-feature images selected by
    ``image_idx`` — growth rings of *different images* are independent, so
    batching them into one call amortizes the per-dispatch latency across
    the whole dataset (the cross-image analog of the reference's live
    per-image GPU detection, Readme.md:42)."""
    if image.ndim == 2:
        return extract_patches_device(image, jnp.stack([y0, x0], -1), patch)

    def one(i, y, x):
        return jax.lax.dynamic_slice(image, (i, y, x), (1, patch, patch))[0]

    return jax.vmap(one)(image_idx, y0, x0)


@partial(jax.jit, static_argnames=("patch",))
def refine_two_stage_patches(
    image,
    positions,
    pixel_tr_pattern,
    samples_match,
    rendered,
    sv_match,
    samples_sym,
    sv_sym,
    window_half_size,
    patch: int,
    image_idx=None,
):
    """Both refinement stages + patch extraction fused into ONE device call.

    extract → matching (position + affine intensity) → re-extract around
    the matched position → 8-DoF symmetry.  The detector growth loop is
    dispatch-bound (each ring is a small batch; the remote runtime costs
    ~30 ms per call), so collapsing the former 4-6 calls per ring into
    one matters more than any kernel-level change.
    image may be (H, W) or a stacked (B, H, W) batch with per-feature
    ``image_idx`` (cross-image ring batching).
    Returns (positions, cost, converged).
    """
    dtype = positions.dtype
    shape2d = image.shape[-2:]
    x0, y0 = _origins_in_jit(shape2d, positions, patch)
    pd = _extract_indexed(image, image_idx, y0, x0, patch)
    org = jnp.stack([x0, y0], -1).astype(dtype)
    pos1, _c1, ok1 = refine_matching_patches(
        pd, org, positions, pixel_tr_pattern, samples_match, rendered,
        sv_match, window_half_size,
    )
    x1, y1 = _origins_in_jit(shape2d, pos1, patch)
    pd2 = _extract_indexed(image, image_idx, y1, x1, patch)
    org2 = jnp.stack([x1, y1], -1).astype(dtype)
    pos2, cost2, ok2 = refine_symmetry_patches(
        pd2, org2, pos1, pixel_tr_pattern, samples_sym, sv_sym,
        window_half_size,
    )
    # pack (x, y, cost, ok) into one array: each device->host readback
    # costs ~45 ms on the remote runtime, so one transfer instead of three
    return jnp.concatenate(
        [pos2, cost2[:, None], (ok1 & ok2).astype(dtype)[:, None]], axis=1
    )


@partial(jax.jit, static_argnames=("num_iterations", "search_radius_px"))
def refine_matching_patches(
    patches,
    origins,
    positions,
    pixel_tr_pattern,
    pattern_samples,
    rendered,
    sample_valid,
    window_half_size,
    num_iterations: int = 10,
    search_radius_px: float = 3.0,
):
    """Batched matching refinement (position + affine intensity) on patches.

    Same optimization as refinement.refine_features_matching (reference
    cpu_refinement_by_matching.h:76-228) with patch-resident sampling.
    Returns (positions, cost, converged).
    """
    n = positions.shape[0]
    dtype = patches.dtype

    h_rel = pixel_tr_pattern / pixel_tr_pattern[:, 2:3, 2:3]
    h_rel = h_rel.at[:, 0, 2].set(0.0)
    h_rel = h_rel.at[:, 1, 2].set(0.0)
    disp = _apply_h(h_rel, pattern_samples)  # (N,S,2) pixel displacements
    sm = sample_valid.astype(dtype)

    def sample_at(pos, with_grad):
        p = pos[:, None, :] + disp - origins[:, None, :]
        return sample_patches(patches, p, with_grad=with_grad)

    def cost_of(state):
        pos, fac, bias = state
        val, _, ok = sample_at(pos, with_grad=False)
        pred = fac[:, None] * rendered + bias[:, None]
        w = sm * ok.astype(dtype)
        r = (val - pred) * w
        valid = jnp.all(ok | ~sample_valid, axis=1)
        return jnp.where(valid, jnp.sum(r * r, axis=1), jnp.inf)

    def body(carry, _):
        (pos, fac, bias), lam, active = carry
        val, grad, ok = sample_at(pos, with_grad=True)
        w = sm * ok.astype(dtype)
        pred = fac[:, None] * rendered + bias[:, None]
        r = (val - pred) * w
        jac = jnp.concatenate(
            [
                grad * w[..., None],
                -rendered[..., None] * w[..., None],
                -jnp.ones_like(rendered)[..., None] * w[..., None],
            ],
            axis=-1,
        )
        big_h = jnp.einsum("nsj,nsk->njk", jac, jac)
        b = jnp.einsum("nsj,ns->nj", jac, r)
        diag_mean = jnp.trace(big_h, axis1=-2, axis2=-1) / 4.0
        lam = jnp.where(lam < 0, 1e-3 * diag_mean, lam)
        h_lm = big_h + lam[:, None, None] * jnp.eye(4, dtype=dtype)
        step = linalg.cholesky_solve_small(h_lm, b)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        test = (pos - step[:, :2], fac - step[:, 2], bias - step[:, 3])
        cost = cost_of((pos, fac, bias))
        test_cost = cost_of(test)
        accept = (test_cost < cost) & active
        pos = jnp.where(accept[:, None], test[0], pos)
        fac = jnp.where(accept, test[1], fac)
        bias = jnp.where(accept, test[2], bias)
        lam = jnp.where(accept, 0.5 * lam, 2.0 * lam)
        diverged = jnp.any(
            jnp.abs(pos - positions) >= window_half_size, axis=-1
        )
        active = active & ~diverged
        return ((pos, fac, bias), lam, active), None

    # Coarse translation search over a small offset grid (see
    # refinement.refine_features_matching for rationale).
    if search_radius_px > 0:
        k = 7
        lin = jnp.linspace(-search_radius_px, search_radius_px, k)
        ox, oy = jnp.meshgrid(lin, lin)
        offsets = jnp.stack([ox.ravel(), oy.ravel()], -1).astype(dtype)
        fac1 = jnp.ones((n,), dtype)
        bias1 = jnp.zeros((n,), dtype)

        def scan_cost(off):
            return cost_of((positions + off[None, :], fac1, bias1))

        costs = jax.vmap(scan_cost)(offsets)
        best = jnp.argmin(costs, axis=0)
        positions_start = positions + offsets[best]
    else:
        positions_start = positions

    fac0 = jnp.full((n,), 1.0, dtype)
    bias0 = jnp.full((n,), 0.0, dtype)
    lam0 = jnp.full((n,), -1.0, dtype)
    ((pos, fac, bias), lam, active), _ = jax.lax.scan(
        body,
        ((positions_start, fac0, bias0), lam0, jnp.ones((n,), bool)),
        None,
        length=num_iterations,
    )
    final_cost = cost_of((pos, fac, bias))
    return pos, final_cost, active & jnp.isfinite(final_cost)
