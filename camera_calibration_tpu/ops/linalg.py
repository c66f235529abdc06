"""Small dense linear algebra helpers used by the solvers.

Closed-form 2×2 / 3×3 solves for the innermost per-feature systems (these
vmap to pure VPU code — no LAPACK calls inside jit), plus a damped PSD
solve for the LM test systems.  The role of the reference's in-kernel
parallel Cholesky (reference: libvis/src/libvis/cuda/cholesky_solver.h:54,192)
is played by these fused batched solves.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve2x2(a, b):
    """Solve a @ x = b for (...,2,2), (...,2). Safe: returns 0 on singular."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    x0 = (a[..., 1, 1] * b[..., 0] - a[..., 0, 1] * b[..., 1]) * inv_det
    x1 = (a[..., 0, 0] * b[..., 1] - a[..., 1, 0] * b[..., 0]) * inv_det
    return jnp.stack([x0, x1], axis=-1)


def solve3x3(a, b):
    """Solve a @ x = b for (...,3,3), (...,3) via the adjugate."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c00,
                    a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                    a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c01,
                    a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                    a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c02,
                    a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                    a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return jnp.einsum("...ij,...j->...i", adj, b) * inv_det[..., None]


def solve_psd(a, b, damping=0.0):
    """Solve (a + damping·I) x = b for a symmetric PSD matrix (batched)."""
    n = a.shape[-1]
    if damping is not None:
        a = a + damping * jnp.eye(n, dtype=a.dtype)
    return jnp.linalg.solve(a, b)


def cholesky_solve_small(a, b):
    """Batched SPD solve for small static k via fully unrolled Cholesky.

    a (..., k, k) SPD (λ-damped normal equations), b (..., k).  Unrolls
    the factorization and both triangular solves into ~k³/3 elementwise
    ops on the batch — pure VPU code.  This is the TPU analog of the
    reference's in-kernel parallel Cholesky (libvis/cuda/
    cholesky_solver.h:54): a LAPACK LU custom call on (N, 8, 8) costs
    ~4 ms per launch on TPU, this costs microseconds.
    """
    k = a.shape[-1]
    l = [[None] * k for _ in range(k)]
    inv_d = [None] * k
    for j in range(k):
        s = a[..., j, j]
        for p in range(j):
            s = s - l[j][p] * l[j][p]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        l[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, k):
            s2 = a[..., i, j]
            for p in range(j):
                s2 = s2 - l[i][p] * l[j][p]
            l[i][j] = s2 * inv_d[j]
    y = [None] * k
    for i in range(k):
        s = b[..., i]
        for p in range(i):
            s = s - l[i][p] * y[p]
        y[i] = s * inv_d[i]
    x = [None] * k
    for i in reversed(range(k)):
        s = y[i]
        for p in range(i + 1, k):
            s = s - l[p][i] * x[p]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=-1)


def inv_2x2(a):
    """Closed-form batched (...,2,2) inverse (0 on singular)."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    row0 = jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1)
    row1 = jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def inv_3x3(a):
    """Closed-form batched (...,3,3) inverse via the adjugate (0 on
    singular) — pure VPU code, replacing the LAPACK-style LU custom
    call that costs milliseconds per launch on TPU."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    safe = jnp.abs(det) > 1e-30
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c00,
                    a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                    a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c01,
                    a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                    a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c02,
                    a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                    a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def inv_spd_6x6(a):
    """Batched (...,6,6) SPD inverse by 3×3 block elimination.

    inv([[A, B], [Bᵀ, C]]) with S = C − Bᵀ A⁻¹ B:
      top-left  A⁻¹ + A⁻¹B S⁻¹ BᵀA⁻¹,  top-right  −A⁻¹B S⁻¹,
      bottom-left its transpose,        bottom-right S⁻¹.
    Closed-form 3×3 inverses throughout — no LU custom call.
    """
    a11 = a[..., :3, :3]
    b = a[..., :3, 3:]
    c = a[..., 3:, 3:]
    a11_inv = inv_3x3(a11)
    a_inv_b = jnp.einsum("...ij,...jk->...ik", a11_inv, b)
    s = c - jnp.einsum("...ji,...jk->...ik", b, a_inv_b)
    s_inv = inv_3x3(s)
    tr = -jnp.einsum("...ij,...jk->...ik", a_inv_b, s_inv)
    tl = a11_inv - jnp.einsum("...ij,...kj->...ik", tr, a_inv_b)
    bl = jnp.swapaxes(tr, -1, -2)
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, s_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv_spd_blocks(a):
    """Batched SPD inverse dispatching to the closed forms for the block
    sizes the BA solvers use (2, 3, 6); falls back to jnp.linalg.inv."""
    k = a.shape[-1]
    if k == 2:
        return inv_2x2(a)
    if k == 3:
        return inv_3x3(a)
    if k == 6:
        return inv_spd_6x6(a)
    return jnp.linalg.inv(a)
