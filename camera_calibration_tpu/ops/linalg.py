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
