"""Sub-pixel corner refinement: batched 8-DoF symmetry + matching stages.

The detector's hot kernel.  Semantics match the reference's two-stage
refinement (reference: applications/camera_calibration/src/
camera_calibration/feature_detection/cpu_refinement_by_symmetry.h:41-470,
cpu_refinement_by_matching.h:76-232; GPU analog: one thread-block per
feature, cuda_refinement_by_symmetry.cu:539):

- *symmetry* stage: optimize the full local 8-DoF homography
  ``pixel_tr_pattern`` so that the image is symmetric around the feature:
  single-channel residual I(H·s) − I(−H·s) (star patterns have even
  segment counts, so mirrored points share a color), or gradient residual
  ∇I(H·s) + ∇I(−H·s); LM with λ·{0.5, 2}, 30 iterations, divergence check
  against the original window (cpu_refinement_by_symmetry.h:41-180).
- *matching* stage: render the known pattern through the local homography
  (16× AA) and optimize position + affine intensity (4 DoF)
  (cpu_refinement_by_matching.h:76-232).

TPU-native design: ALL features iterate together — per-feature 8×8 (or
4×4) normal equations are built by one batched einsum over samples and
solved with a batched linear solve; per-feature λ/accept state replaces
the reference's per-feature loops/in-kernel Cholesky.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from camera_calibration_tpu.ops import interp, linalg


def make_sample_offsets(rng, window_half_size: int, count: int | None = None):
    """Random sample offsets in [−1, 1]² (scaled by window at use time).

    (reference: feature_detector_tagged_pattern.cc:240-248 — pool of
    8·(2w+1)² uniform samples)
    """
    if count is None:
        count = 8 * (2 * window_half_size + 1) ** 2
    return rng.uniform(-1.0, 1.0, (count, 2))


def _apply_h(h, pts):
    """Apply homographies (N,3,3) to points (N,S,2) -> (N,S,2)."""
    x = pts[..., 0]
    y = pts[..., 1]
    px = h[:, None, 0, 0] * x + h[:, None, 0, 1] * y + h[:, None, 0, 2]
    py = h[:, None, 1, 0] * x + h[:, None, 1, 1] * y + h[:, None, 1, 2]
    pw = h[:, None, 2, 0] * x + h[:, None, 2, 1] * y + h[:, None, 2, 2]
    safe = jnp.where(jnp.abs(pw) > 1e-12, pw, 1e-12)
    return jnp.stack([px / safe, py / safe], axis=-1)


@partial(jax.jit, static_argnames=("num_iterations", "use_gradient"))
def refine_features_symmetry(
    image,
    positions,
    pixel_tr_pattern,
    pattern_samples,
    sample_valid,
    window_half_size,
    num_iterations: int = 30,
    use_gradient: bool = False,
):
    """Batched symmetry refinement.

    image: (H, W) float (or (H, W, 2) gradient image if use_gradient).
    positions: (N, 2) initial positions, pixel-center convention.
    pixel_tr_pattern: (N, 3, 3) local homography pattern→pixel *relative*
      (translation column replaced by the feature position internally,
      reference cpu_refinement_by_symmetry.h:63-71).
    pattern_samples: (N, S, 2) sample positions in pattern space (window
      samples pre-mapped through pattern_tr_pixel).
    sample_valid: (N, S) bool mask for padded samples.
    Returns (positions (N,2), final_cost (N,), converged (N,) bool).
    """
    n = positions.shape[0]
    dtype = image.dtype
    img_shape = image.shape

    # pixel_tr_pattern with translation = initial position, normalized so
    # h[2,2] = 1 (reference :63-71).
    h0 = pixel_tr_pattern
    h0 = h0.at[:, 0, 2].set(positions[:, 0] * h0[:, 2, 2])
    h0 = h0.at[:, 1, 2].set(positions[:, 1] * h0[:, 2, 2])
    h0 = h0 / h0[:, 2:3, 2:3]

    sm = sample_valid.astype(dtype)

    def cost_of(h):
        pa = _apply_h(h, pattern_samples)
        pb = _apply_h(h, -pattern_samples)
        ia = interp.bilinear(image, pa)
        ib = interp.bilinear(image, pb)
        ok = interp.in_bounds(img_shape, pa) & interp.in_bounds(img_shape, pb)
        if use_gradient:
            r = ia + ib  # gradients cancel at mirrored points
            sq = jnp.sum(r * r, axis=-1)
        else:
            r = ia - ib
            sq = r * r
        valid_all = jnp.all(ok | ~sample_valid, axis=1)
        cost = jnp.sum(sq * sm * ok.astype(dtype), axis=1)
        return jnp.where(valid_all, cost, jnp.inf)

    def h_and_b(h):
        """Per-feature 8x8 normal equations (reference :252-399)."""
        def one_side(sign):
            s = sign * pattern_samples
            pos = _apply_h(h, s)
            if use_gradient:
                val, grad = interp.bilinear_with_jacobian(image, pos)
                # val (N,S,2), grad (N,S,2,2)
            else:
                v, g = interp.bilinear_with_jacobian(image, pos)
                val, grad = v[..., None], g[..., None, :]
            x = s[..., 0]
            y = s[..., 1]
            denom = (
                h[:, None, 2, 0] * x + h[:, None, 2, 1] * y + 1.0
            )
            t0 = 1.0 / denom
            t1 = -t0 * t0
            num_x = h[:, None, 0, 0] * x + h[:, None, 0, 1] * y + h[:, None, 0, 2]
            num_y = h[:, None, 1, 0] * x + h[:, None, 1, 1] * y + h[:, None, 1, 2]
            t2 = num_x * t1
            t3 = num_y * t1
            zeros = jnp.zeros_like(x)
            # position_wrt_homography (N,S,2,8)
            row0 = jnp.stack(
                [x * t0, y * t0, t0, zeros, zeros, zeros, x * t2, y * t2], -1
            )
            row1 = jnp.stack(
                [zeros, zeros, zeros, x * t0, y * t0, t0, x * t3, y * t3], -1
            )
            pwh = jnp.stack([row0, row1], axis=-2)
            # jac (N,S,C,8) = grad (N,S,C,2) @ pwh (N,S,2,8)
            jac = jnp.einsum("nscd,nsdk->nsck", grad, pwh)
            ok = interp.in_bounds(img_shape, pos)
            return val, jac, ok

        va, ja, oka = one_side(1.0)
        vb, jb, okb = one_side(-1.0)
        if use_gradient:
            r = va + vb
            jac = ja + jb
        else:
            r = va - vb
            jac = ja - jb
        w = (sm * (oka & okb).astype(dtype))[..., None]  # (N,S,1)
        big_h = jnp.einsum("nscj,nsck,nsc->njk", jac, jac, w[..., 0:1] * jnp.ones_like(r))
        b = jnp.einsum("nscj,nsc->nj", jac, r * w)
        cost = jnp.sum(r * r * w, axis=(1, 2))
        valid = jnp.all((oka & okb) | ~sample_valid, axis=1)
        return big_h, b, jnp.where(valid, cost, jnp.inf), valid

    def body(carry, _):
        h, lam, best_cost, active = carry
        big_h, b, cost, valid = h_and_b(h)
        diag_mean = jnp.trace(big_h, axis1=-2, axis2=-1) / 8.0
        lam = jnp.where(lam < 0, 1e-3 * diag_mean, lam)
        h_lm = big_h + lam[:, None, None] * jnp.eye(8, dtype=dtype)
        step = linalg.cholesky_solve_small(h_lm, b)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        h_test = h.at[:, 0, 0].add(-step[:, 0])
        h_test = h_test.at[:, 0, 1].add(-step[:, 1])
        h_test = h_test.at[:, 0, 2].add(-step[:, 2])
        h_test = h_test.at[:, 1, 0].add(-step[:, 3])
        h_test = h_test.at[:, 1, 1].add(-step[:, 4])
        h_test = h_test.at[:, 1, 2].add(-step[:, 5])
        h_test = h_test.at[:, 2, 0].add(-step[:, 6])
        h_test = h_test.at[:, 2, 1].add(-step[:, 7])
        test_cost = cost_of(h_test)
        accept = (test_cost < cost) & active & valid
        h = jnp.where(accept[:, None, None], h_test, h)
        lam = jnp.where(accept, 0.5 * lam, 2.0 * lam)
        best_cost = jnp.minimum(best_cost, jnp.where(valid, cost, jnp.inf))
        best_cost = jnp.where(accept, test_cost, best_cost)
        # divergence: left the original window
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


@partial(jax.jit, static_argnames=("num_iterations", "search_radius_px"))
def refine_features_matching(
    image,
    positions,
    pixel_tr_pattern,
    pattern_samples,
    rendered,
    sample_valid,
    window_half_size,
    num_iterations: int = 10,
    search_radius_px: float = 3.0,
):
    """Batched matching refinement: position (2) + affine intensity (2).

    rendered: (N, S) pattern intensities at `pattern_samples` (anti-aliased
    through the local homography — precompute with
    render_samples()).  Optimizes ``I(pos + H·s) ≈ fac·rendered + bias``
    over (dx, dy, fac, bias) (reference: cpu_refinement_by_matching.h:76-228).
    Returns (positions, cost, converged).
    """
    n = positions.shape[0]
    dtype = image.dtype
    img_shape = image.shape

    # local sample displacement in pixel space (relative to the feature)
    h_rel = pixel_tr_pattern / pixel_tr_pattern[:, 2:3, 2:3]
    h_rel = h_rel.at[:, 0, 2].set(0.0)
    h_rel = h_rel.at[:, 1, 2].set(0.0)
    disp = _apply_h(h_rel, pattern_samples)  # (N,S,2)
    sm = sample_valid.astype(dtype)

    def cost_of(state):
        pos, fac, bias = state
        p = pos[:, None, :] + disp
        val = interp.bilinear(image, p)
        ok = interp.in_bounds(img_shape, p)
        pred = fac[:, None] * rendered + bias[:, None]
        r = (val - pred) * sm * ok.astype(dtype)
        valid = jnp.all(ok | ~sample_valid, axis=1)
        return jnp.where(valid, jnp.sum(r * r, axis=1), jnp.inf)

    def body(carry, _):
        (pos, fac, bias), lam, active = carry
        p = pos[:, None, :] + disp
        val, grad = interp.bilinear_with_jacobian(image, p)
        ok = interp.in_bounds(img_shape, p)
        w = sm * ok.astype(dtype)
        pred = fac[:, None] * rendered + bias[:, None]
        r = (val - pred) * w
        # jac wrt (dx, dy, dfac, dbias): (N,S,4)
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

    # Coarse translation search before LM: the star pattern decorrelates
    # within ~2 px, so seeds with multi-pixel error sit on a flat plateau
    # where the 4-DoF LM collapses into the degenerate constant-intensity
    # valley.  A batched cost scan over a small offset grid restores a
    # basin the LM can descend (improvement over the reference, whose
    # matching relies on sub-pixel tag corners for its seeds).
    if search_radius_px > 0:
        k = 7
        lin = jnp.linspace(-search_radius_px, search_radius_px, k)
        ox, oy = jnp.meshgrid(lin, lin)
        offsets = jnp.stack([ox.ravel(), oy.ravel()], -1).astype(dtype)  # (k²,2)
        fac1 = jnp.ones((n,), dtype)
        bias1 = jnp.zeros((n,), dtype)

        def scan_cost(off):
            return cost_of((positions + off[None, :], fac1, bias1))

        costs = jax.vmap(scan_cost)(offsets)  # (k², n)
        best = jnp.argmin(costs, axis=0)  # (n,)
        positions_start = positions + offsets[best]
    else:
        positions_start = positions

    # identity intensity model: image ≈ rendered pattern (white = 1)
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
