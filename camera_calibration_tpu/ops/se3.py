"""Quaternion / SE(3) utilities (pure jnp, batch-friendly).

Quaternions are stored as (w, x, y, z), matching the reference engine's
Eigen convention (reference: local_parametrizations/quaternion_parametrization.h:39-60).
An SE(3) transform is the pair (q, t) acting as ``x -> R(q) x + t``.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    """Hamilton product a*b for (...,4) (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v + 2 w (u x v) + 2 (u x (u x v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q):
    """(...,4) -> (...,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """(...,3,3) -> (...,4) (w,x,y,z), branch-free (Shepperd via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate constructions; pick the numerically best.
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4,4)
    scores = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def matrix_to_quat_np(m):
    """NumPy mirror of :func:`matrix_to_quat` for host orchestration loops.

    Small per-image pose conversions run in plain NumPy: each eager jnp
    call on a remote-accelerator default backend costs a ~0.4 s remote
    dispatch/compile, which dominated build_ba_state (measured 8.4 s of
    a 24 s phase for 20 images).
    """
    import numpy as np

    m = np.asarray(m, np.float64)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    qw = np.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = np.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = np.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = np.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = np.stack([qw, qx, qy, qz], axis=-2)
    scores = np.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    best = np.argmax(scores, axis=-1)
    q = np.take_along_axis(
        cands, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_exp(u):
    """Exp map: tangent (...,3) -> unit quaternion rotating by angle |u|.

    Standard half-angle convention: R(quat_exp(u)) = exp([u]_x).
    Gradient-safe at u = 0 in both AD modes (the norm is computed from a
    sanitized squared length so reverse mode never sees 0/0; the small
    branch uses the Taylor series).
    """
    sq = jnp.sum(u * u, axis=-1, keepdims=True)
    small = sq < 1e-16
    sq_safe = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(sq_safe)
    half = 0.5 * angle
    # sinc(half)/2: series 0.5 − sq/48 + O(sq²) near zero
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * u], axis=-1)


def quat_log(q):
    """Log map: unit quaternion -> tangent (...,3) with R = exp([log]_x)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # take the short arc
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-8
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, vn))
    return scale[..., None] * v


# ------------------------------ SE(3) pairs ------------------------------


def se3_apply(q, t, x):
    return quat_rotate(q, x) + t


def se3_compose(qa, ta, qb, tb):
    """(qa,ta) ∘ (qb,tb): first apply b, then a."""
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def se3_inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def retract_pose(q, t, delta):
    """Left-multiplicative local update of an SE(3) pose.

    delta: (...,6) = (rotation tangent, translation delta).
    Rotation update is a left-multiplied exp-map quaternion; translation is
    additive — the same structure as the reference state update
    (reference: bundle_adjustment/joint_optimization.cc:172-214).
    """
    dq = quat_exp(delta[..., 0:3])
    return quat_mul(dq, q), t + delta[..., 3:6]


def average_se3(qs, ts, weights=None):
    """Average of SE(3) poses: SVD-projected mean rotation + mean translation.

    Mirrors the capability of the reference's AverageSE3
    (reference: libvis/src/libvis/sophus.h:75-92), implemented via the
    chordal-L2 rotation mean (SVD orthogonal projection of the mean matrix).
    qs: (N,4), ts: (N,3).
    """
    if weights is None:
        weights = jnp.ones(qs.shape[0], dtype=ts.dtype)
    w = weights / jnp.sum(weights)
    mean_m = jnp.einsum("n,nij->ij", w, quat_to_matrix(qs))
    u, _, vt = jnp.linalg.svd(mean_m)
    det = jnp.linalg.det(u @ vt)
    d = jnp.array([1.0, 1.0, 0.0], dtype=mean_m.dtype) + jnp.array(
        [0.0, 0.0, 1.0], dtype=mean_m.dtype) * det
    r = u @ jnp.diag(d) @ vt
    mean_t = jnp.einsum("n,ni->i", w, ts)
    return matrix_to_quat(r), mean_t
