"""Homography estimation by the normalized DLT algorithm.

Capability parity with the reference's NormalizedDLT
(reference: libvis/src/libvis/dlt.h:64-…): isotropic Hartley normalization
of both point sets, SVD null-vector of the stacked 2N×9 system, and
de-normalization.  Written batch-first: a fixed-size correspondence table
with per-row weights (0/1 masks) so RANSAC hypotheses and the detector's
local-homography fits vmap cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalization(pts, w):
    """Isotropic normalizing similarity for weighted 2D points (N,2), (N,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    centroid = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.linalg.norm(pts - centroid, axis=-1)
    mean_dist = jnp.sum(d * w) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-12)
    # T maps pts -> normalized: x' = scale * (x - centroid)
    return centroid, scale


def homography_dlt(src, dst, weights=None):
    """Estimate H (3,3) with dst ~ H · src from (N,2) correspondences.

    weights: optional (N,) nonnegative row weights (use 0/1 masks for
    padded/RANSAC-subset input; ≥4 effective correspondences required).
    Returns H normalized so that ||H||_F = 1 with positive last element.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    n = src.shape[0]
    w = jnp.ones((n,), src.dtype) if weights is None else jnp.asarray(weights)

    c_s, s_s = _normalization(src, w)
    c_d, s_d = _normalization(dst, w)
    sn = (src - c_s) * s_s
    dn = (dst - c_d) * s_d

    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Rows of the 2N×9 DLT system.
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    a = jnp.concatenate([r1, r2], axis=0)
    wa = jnp.concatenate([w, w], axis=0)
    a = a * jnp.sqrt(wa)[:, None]

    # Null vector = eigenvector of AᵀA with the smallest eigenvalue.
    ata = a.T @ a
    _, vecs = jnp.linalg.eigh(ata)
    h = vecs[:, 0]
    hn = h.reshape(3, 3)

    # De-normalize: H = T_d⁻¹ · Hn · T_s.
    t_s = jnp.array(
        [[s_s, 0.0, -s_s * c_s[0]], [0.0, s_s, -s_s * c_s[1]], [0.0, 0.0, 1.0]],
        dtype=src.dtype,
    )
    t_d_inv = jnp.array(
        [
            [1.0 / s_d, 0.0, c_d[0]],
            [0.0, 1.0 / s_d, c_d[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=src.dtype,
    )
    hh = t_d_inv @ hn @ t_s
    hh = hh / jnp.linalg.norm(hh)
    return hh * jnp.sign(hh[2, 2] + 1e-30)


def apply_homography(h, pts):
    """Apply H (3,3) to points (..., 2)."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = p @ h.T
    return q[..., :2] / q[..., 2:3]


homography_dlt_batched = jax.vmap(homography_dlt, in_axes=(0, 0, 0))
