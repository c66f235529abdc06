"""Functional dispatch over camera-model families.

Replaces the reference's virtual CameraModel interface + IDENTIFY_CAMERA_MODEL
macros (reference: models/camera_model.h:42, models/all_models.h:45-141)
with isinstance dispatch over pytree model classes.  Two intrinsics
families exist for optimization purposes:

- *grid* models (CentralGeneric, NoncentralGeneric): intrinsics tangent is
  a per-knot 2-DoF (or 5-DoF) field; Jacobians are sparse 4×4-window blocks.
- *dense parametric* models (ThinPrismFisheye, OpenCV, Radial): intrinsics
  tangent is the Euclidean parameter vector; Jacobians are dense (2, K).
"""

from __future__ import annotations

import jax.numpy as jnp

from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import noncentral_generic as ncg
from camera_calibration_tpu.models import parametric as pm
from camera_calibration_tpu.models.base import replace
from camera_calibration_tpu.ops import manifolds

GRID_MODELS = (cg.CentralGenericModel, ncg.NoncentralGenericModel)
PARAMETRIC_MODELS = (
    pm.CentralThinPrismFisheyeModel,
    pm.CentralOpenCVModel,
    pm.CentralRadialModel,
)


def is_grid_model(model) -> bool:
    return isinstance(model, GRID_MODELS)


def intrinsics_tangent_zero(model):
    if isinstance(model, ncg.NoncentralGenericModel):
        # 5 DoF/knot: 2 direction tangent + 3 origin (reference:
        # noncentral_generic.h:142 update_parameter_count = 5*W*H)
        return jnp.zeros(
            model.direction_grid.shape[:2] + (5,), model.direction_grid.dtype
        )
    if is_grid_model(model):
        return jnp.zeros(model.grid.shape[:2] + (2,), model.grid.dtype)
    return jnp.zeros_like(model.params)


def intrinsics_retract(model, tangent, scale=1.0):
    if isinstance(model, ncg.NoncentralGenericModel):
        return replace(
            model,
            direction_grid=manifolds.retract_direction(
                model.direction_grid, scale * tangent[..., 0:2]
            ),
            point_grid=model.point_grid + scale * tangent[..., 2:5],
        )
    if is_grid_model(model):
        return replace(
            model, grid=manifolds.retract_direction(model.grid, scale * tangent)
        )
    return replace(model, params=model.params + scale * tangent)


def project_points(model, x_cam, init_xy=None, max_iterations=10):
    """(pixels, aux, valid) for any model family."""
    if isinstance(model, ncg.NoncentralGenericModel):
        return ncg.project_points(
            model, x_cam, init_xy=init_xy, max_iterations=max_iterations
        )
    if is_grid_model(model):
        return cg.project_points(
            model, x_cam, init_xy=init_xy, max_iterations=max_iterations
        )
    return pm.project_points(model, x_cam)


def unproject(model, pixels, max_iterations=20):
    """Unit directions for central models; line directions for noncentral."""
    if isinstance(model, ncg.NoncentralGenericModel):
        d, _o, valid = ncg.unproject(model, pixels)
        return d, valid
    if is_grid_model(model):
        return cg.unproject(model, pixels)
    return pm.unproject(model, pixels, max_iterations=max_iterations)


def projection_point_jacobian(model, x_cam, aux):
    """d pixel / d camera-space point at a converged projection, (N, 2, 3).

    aux: the second output of project_points (grid coords for grid models,
    ignored for parametric).  Used by the stereo slanted-window warps.
    """
    import jax

    if isinstance(model, ncg.NoncentralGenericModel):
        raise NotImplementedError(
            "stereo projection jacobian: fit a central model "
            "(the reference's stereo also only compiles the central path, "
            "pixel_corner_projector.cuh:279-481)"
        )
    if is_grid_model(model):
        sens = cg.projection_sensitivities(model, aux)
        p = sens["pix_wrt_dir"]
        norm = jnp.linalg.norm(x_cam, axis=-1, keepdims=True)
        d = x_cam / jnp.maximum(norm, 1e-18)
        pd = jnp.einsum("nij,nj->ni", p, d)
        return (p - pd[..., None] * d[:, None, :]) / jnp.maximum(
            norm[..., None], 1e-18
        )

    def f(x):
        px, _, _ = pm.project_points(model, x[None])
        return px[0]

    return jax.vmap(jax.jacfwd(f))(x_cam)
