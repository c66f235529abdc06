"""Bundle-adjustment state: a pure pytree over manifolds.

Equivalent of the reference's BAState (reference: applications/
camera_calibration/src/camera_calibration/bundle_adjustment/ba_state.h:46-97):
rig poses per imageset, camera-in-rig extrinsics, 3D pattern points, and
per-camera intrinsics models.  Convention (ba_state.h:65):
``image_tr_global = camera_tr_rig ∘ rig_tr_global`` — a point in global
(pattern) space maps to camera space as
``x_cam = R_c (R_r x + t_r) + t_c``.

Tangent layout mirrors the reference's variable ordering
(joint_optimization.cc:44-225): 6 DoF per imageset pose, 6 per camera
extrinsic, 3 per point, 2 per intrinsics-grid knot.  Tangents are pytrees
(BATangent), never flattened — the PCG solver operates on pytrees.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from camera_calibration_tpu.models import protocol
from camera_calibration_tpu.ops import se3


def _pytree(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree
class BAState:
    rig_q_global: jnp.ndarray  # (M, 4) wxyz
    rig_t_global: jnp.ndarray  # (M, 3)
    cam_q_rig: jnp.ndarray  # (C, 4)
    cam_t_rig: jnp.ndarray  # (C, 3)
    points: jnp.ndarray  # (P, 3)
    intrinsics: tuple  # per-camera model pytrees (e.g. CentralGenericModel)


@_pytree
class BATangent:
    rig: jnp.ndarray  # (M, 6) = (ω, δt)
    cam: jnp.ndarray  # (C, 6)
    points: jnp.ndarray  # (P, 3)
    intr: tuple  # per camera: knot-tangent field (grid) or param delta (dense)


def zero_tangent(state: BAState) -> BATangent:
    return BATangent(
        rig=jnp.zeros(state.rig_q_global.shape[:1] + (6,), state.rig_t_global.dtype),
        cam=jnp.zeros(state.cam_q_rig.shape[:1] + (6,), state.cam_t_rig.dtype),
        points=jnp.zeros_like(state.points),
        intr=tuple(
            protocol.intrinsics_tangent_zero(m) for m in state.intrinsics
        ),
    )


def retract(state: BAState, tangent: BATangent, scale=1.0) -> BAState:
    """Apply a tangent update to every variable group.

    Pose updates are left-multiplicative exp-map on rotations + additive
    translations; grid knots use 2-DoF unit-direction retractions
    (reference: joint_optimization.cc:172-214, central_grid.h:169-184).
    """
    rig_q, rig_t = se3.retract_pose(
        state.rig_q_global, state.rig_t_global, scale * tangent.rig
    )
    cam_q, cam_t = se3.retract_pose(
        state.cam_q_rig, state.cam_t_rig, scale * tangent.cam
    )
    intr = tuple(
        protocol.intrinsics_retract(m, g, scale)
        for m, g in zip(state.intrinsics, tangent.intr)
    )
    return BAState(
        rig_q_global=rig_q,
        rig_t_global=rig_t,
        cam_q_rig=cam_q,
        cam_t_rig=cam_t,
        points=state.points + scale * tangent.points,
        intrinsics=intr,
    )


def fix_gauge_mask(state: BAState, freeze=()) -> BATangent:
    """Multipliers that freeze the first camera's extrinsics (identity rig
    anchor).  With a single camera the reference parameterizes no
    camera_tr_rig at all (joint_optimization.cc:100-116); here we keep the
    array but zero its tangent, which is equivalent.

    freeze: iterable of variable-group names to freeze entirely —
    "poses", "extrinsics", "points", "intrinsics".  Freezing
    points+intrinsics gives the reference's --localize_only mode
    (calibration.cc); the reference test harness has the same per-group
    toggles (test/util.h:279-282).
    """
    freeze = set(freeze)
    dtype = state.cam_t_rig.dtype
    rig_mask = jnp.full(
        state.rig_q_global.shape[:1] + (6,),
        0.0 if "poses" in freeze else 1.0, state.rig_t_global.dtype,
    )
    cam_mask = jnp.full(
        state.cam_q_rig.shape[:1] + (6,),
        0.0 if "extrinsics" in freeze else 1.0, dtype,
    )
    cam_mask = cam_mask.at[0].set(0.0)
    pts_mask = jnp.full_like(
        state.points, 0.0 if "points" in freeze else 1.0
    )
    intr_scale = 0.0 if "intrinsics" in freeze else 1.0
    return BATangent(
        rig=rig_mask,
        cam=cam_mask,
        points=pts_mask,
        intr=tuple(
            jnp.full_like(protocol.intrinsics_tangent_zero(m), intr_scale)
            for m in state.intrinsics
        ),
    )


def apply_freeze(state_old: BAState, state_new: BAState, freeze=()) -> BAState:
    """Restore frozen variable groups EXACTLY from the pre-step state.

    Masking the tangent zeroes the update, but retract() still re-runs
    the manifold normalizations (quaternion/unit-direction), whose
    rounding can perturb frozen values by an ulp — the reference's
    FixVariable keeps fixed variables bit-identical (lm_optimizer.h:360),
    and so must --localize_only-style freezing here.
    """
    freeze = set(freeze)
    if not freeze:
        return state_new
    return BAState(
        rig_q_global=(state_old.rig_q_global if "poses" in freeze
                      else state_new.rig_q_global),
        rig_t_global=(state_old.rig_t_global if "poses" in freeze
                      else state_new.rig_t_global),
        cam_q_rig=(state_old.cam_q_rig if "extrinsics" in freeze
                   else state_new.cam_q_rig),
        cam_t_rig=(state_old.cam_t_rig if "extrinsics" in freeze
                   else state_new.cam_t_rig),
        points=(state_old.points if "points" in freeze
                else state_new.points),
        intrinsics=(state_old.intrinsics if "intrinsics" in freeze
                    else state_new.intrinsics),
    )


def broadcast_rows(arr, idx, grid_shape, axis):
    """arr[idx] — or, in (M, P) grid layout, the equivalent broadcast.

    axis 0: idx is the imageset column (row m repeated P times);
    axis 1: idx is the point column (rows 0..P-1 tiled M times).
    A broadcast+reshape is ~2× cheaper than the gather on TPU and lets
    XLA fuse the expansion into the consumer.
    """
    if grid_shape is not None:
        m, p = grid_shape
        if axis == 0 and arr.shape[0] == m:
            return jnp.broadcast_to(
                arr[:, None], (m, p) + arr.shape[1:]
            ).reshape((m * p,) + arr.shape[1:])
        if axis == 1 and arr.shape[0] == p:
            return jnp.broadcast_to(
                arr[None], (m, p) + arr.shape[1:]
            ).reshape((m * p,) + arr.shape[1:])
    return arr[idx]


def transform_to_camera(state: BAState, imageset_idx, camera_idx, points,
                        grid_shape=None):
    """x_cam for observations: gather poses and apply the rig chain."""
    rq = broadcast_rows(state.rig_q_global, imageset_idx, grid_shape, 0)
    rt = broadcast_rows(state.rig_t_global, imageset_idx, grid_shape, 0)
    cq = state.cam_q_rig[camera_idx]
    ct = state.cam_t_rig[camera_idx]
    x_rig = se3.quat_rotate(rq, points) + rt
    return se3.quat_rotate(cq, x_rig) + ct, x_rig


def scale_state(state: BAState, factor) -> BAState:
    """Scale the metric scale of the reconstruction (reference:
    ba_state.cc:60-76 ScaleState): translations and points scale, and so
    do metric intrinsics — a noncentral model's line-origin grid lives in
    camera-frame meters (NoncentralGenericModel::Scale,
    noncentral_generic.cc:148-154); direction fields and parametric
    pixel-space models are scale-invariant."""
    from camera_calibration_tpu.models import noncentral_generic as ncg
    from camera_calibration_tpu.models.base import replace as _replace

    new_intr = tuple(
        _replace(m, point_grid=m.point_grid * factor)
        if isinstance(m, ncg.NoncentralGenericModel) else m
        for m in state.intrinsics
    )
    return BAState(
        rig_q_global=state.rig_q_global,
        rig_t_global=state.rig_t_global * factor,
        cam_q_rig=state.cam_q_rig,
        cam_t_rig=state.cam_t_rig * factor,
        points=state.points * factor,
        intrinsics=new_intr,
    )
