"""Local parametrizations (manifold retractions) for optimization variables.

The calibration state lives on products of manifolds: unit directions on S²
(2 DoF), 3D lines as (unit direction, origin) with 5 DoF, and unit
quaternions (3 DoF).  Updates are expressed in local Euclidean tangent
coordinates and mapped back by a *retraction*.

Semantics match the reference engine's local parametrizations
(reference: applications/camera_calibration/src/camera_calibration/
local_parametrizations/{direction,line,quaternion}_parametrization.h):

- direction tangent frame: ``t1 = normalize(d × e)`` with ``e = (0,1,0)`` if
  ``|d.x| > 0.9`` else ``(1,0,0)``; ``t2 = d × t1``
  (line_parametrization.h:54-60).
- direction retraction: ``d' = normalize(d + δ1·t1 + δ2·t2)``
  (direction_parametrization.h:45-54).
- line retraction: 5 DoF — 2 for the direction (as above), 2 for the origin
  in the tangent plane, 1 along the line direction
  (line_parametrization.h:108-120).

All functions are pure jnp and broadcast over leading batch dims.  Unlike
the reference (which needs hand-derived tangent Jacobians for its
accumulators), Jacobians here come from JAX AD applied to these
retractions at δ = 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from camera_calibration_tpu.ops import se3


def direction_tangents(d):
    """Tangent frame (t1, t2) of unit direction(s) d (..., 3).

    Deterministic, branch-free version of the reference's
    ComputeTangentsForDirectionOrLine (line_parametrization.h:54-60).
    """
    use_y = jnp.abs(d[..., 0]) > 0.9
    e = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=d.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=d.dtype),
    )
    t1 = jnp.cross(d, e)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(d, t1)  # already unit length for unit d
    return t1, t2


def retract_direction(d, delta):
    """Retract unit direction(s) by 2-DoF tangent delta (..., 2)."""
    t1, t2 = direction_tangents(d)
    nd = d + delta[..., 0:1] * t1 + delta[..., 1:2] * t2
    return nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)


def direction_local_offset(base, target):
    """Tangent coords of `target` in the local frame of unit dir `base`.

    Inverse of retract_direction for directions in the same hemisphere
    (reference: direction_parametrization.h:71-86).
    """
    t1, t2 = direction_tangents(base)
    factor = 1.0 / jnp.sum(base * target, axis=-1, keepdims=True)
    offset = factor * target - base
    return jnp.stack(
        [jnp.sum(t1 * offset, axis=-1), jnp.sum(t2 * offset, axis=-1)], axis=-1
    )


def retract_line(direction, origin, delta):
    """Retract a 3D line (unit direction, origin) by a 5-DoF delta.

    delta = (dir δ1, dir δ2, origin δ1, origin δ2, origin-along-line)
    (reference: line_parametrization.h:108-120).
    """
    t1, t2 = direction_tangents(direction)
    new_origin = (
        origin
        + delta[..., 2:3] * t1
        + delta[..., 3:4] * t2
        + delta[..., 4:5] * direction
    )
    nd = direction + delta[..., 0:1] * t1 + delta[..., 1:2] * t2
    new_dir = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)
    return new_dir, new_origin


def retract_quaternion(q, delta):
    """Left-multiplicative quaternion retraction by 3-DoF tangent delta.

    (reference: quaternion_parametrization.h:64-…; exact exp-map form.)
    """
    return se3.quat_mul(se3.quat_exp(delta), q)
