"""Synthetic BA convergence harness.

The JAX analog of the reference's canonical integration fixture
(reference: applications/camera_calibration/src/camera_calibration/test/
util.h:276-…): ground-truth intrinsics are a spline grid fitted to a
pinhole camera; random 3D points and poses generate exact observations;
the state is perturbed; bundle adjustment must re-converge.
"""

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.ba.dataset import ObservationTable
from camera_calibration_tpu.ba.state import BAState
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import parametric as pm
from camera_calibration_tpu.models import pinhole, protocol
from camera_calibration_tpu.models.fit import fit_central_generic_to_dense
from camera_calibration_tpu.ops import manifolds, se3


def make_gt_model(w=64, h=48, grid_res=7):
    cam = pinhole.make_pinhole(
        fx=0.85 * w, fy=0.85 * w, cx=0.5 * w, cy=0.5 * h, width=w, height=h
    )
    dense = pinhole.direction_image(cam)
    model = fit_central_generic_to_dense(
        np.asarray(dense), np.ones((h, w), bool), (grid_res, grid_res),
        max_iterations=15,
    )
    return cam, model


def make_problem(
    seed=0,
    n_points=100,
    n_poses=25,
    n_cameras=1,
    w=64,
    h=48,
    grid_res=7,
    noise_px=0.0,
    model_kind="grid",
):
    """Build GT state + exact observations (optionally with pixel noise)."""
    rng = np.random.default_rng(seed)
    if model_kind == "grid":
        _, model = make_gt_model(w, h, grid_res)
    elif model_kind == "tpf":
        params = jnp.asarray(
            [0.75 * w, 0.75 * w, 0.5 * w, 0.5 * h,
             0.1, -0.2, 0.1, -0.02, 1e-4, -5e-5, 3e-5, -4e-5])
        model = pm.CentralThinPrismFisheyeModel(
            params=params, width=w, height=h, use_equidistant_projection=True)
    else:
        raise ValueError(model_kind)

    # Pattern points: a jittered plane at z=0 in global coords.
    pts = np.zeros((n_points, 3))
    pts[:, 0] = rng.uniform(-0.6, 0.6, n_points)
    pts[:, 1] = rng.uniform(-0.45, 0.45, n_points)
    pts[:, 2] = rng.uniform(-0.03, 0.03, n_points)

    # Rig poses: camera ~1.6-2.4 away, looking roughly at the pattern.
    rig_q = []
    rig_t = []
    for _ in range(n_poses):
        w_rot = rng.normal(0, 0.1, 3)
        q = np.asarray(se3.quat_exp(jnp.asarray(w_rot)))
        t = np.array(
            [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), rng.uniform(1.6, 2.4)]
        )
        rig_q.append(q)
        rig_t.append(t)
    rig_q = np.stack(rig_q)
    rig_t = np.stack(rig_t)

    # Camera extrinsics: identity for cam0; small offsets for a rig.
    cam_q = np.tile(np.array([1.0, 0, 0, 0]), (n_cameras, 1))
    cam_t = np.zeros((n_cameras, 3))
    for ci in range(1, n_cameras):
        cam_q[ci] = np.asarray(se3.quat_exp(jnp.asarray(rng.normal(0, 0.05, 3))))
        cam_t[ci] = rng.normal(0, 0.1, 3)

    state_gt = BAState(
        rig_q_global=jnp.asarray(rig_q),
        rig_t_global=jnp.asarray(rig_t),
        cam_q_rig=jnp.asarray(cam_q),
        cam_t_rig=jnp.asarray(cam_t),
        points=jnp.asarray(pts),
        intrinsics=tuple(model for _ in range(n_cameras)),
    )

    # Exact observations through GT model, sorted by camera (segments).
    ims, cams, ptids, pixels = [], [], [], []
    segments = []
    margin = 1.0
    for ci in range(n_cameras):
        start = len(ims)
        for mi in range(n_poses):
            x_rig = np.asarray(
                se3.quat_rotate(jnp.asarray(rig_q[mi]), jnp.asarray(pts))
            ) + rig_t[mi]
            x_cam = (
                np.asarray(
                    se3.quat_rotate(jnp.asarray(cam_q[ci]), jnp.asarray(x_rig))
                )
                + cam_t[ci]
            )
            px, _, valid = protocol.project_points(
                state_gt.intrinsics[ci],
                jnp.asarray(x_cam),
                max_iterations=80,
            )
            px = np.asarray(px)
            valid = np.asarray(valid) & (
                (px[:, 0] > margin)
                & (px[:, 0] < w - margin)
                & (px[:, 1] > margin)
                & (px[:, 1] < h - margin)
            )
            for pi in np.nonzero(valid)[0]:
                ims.append(mi)
                cams.append(ci)
                ptids.append(pi)
                pixels.append(px[pi] + rng.normal(0, noise_px, 2))
        segments.append((start, len(ims) - start))

    obs = ObservationTable(
        imageset=jnp.asarray(np.array(ims, np.int32)),
        camera=jnp.asarray(np.array(cams, np.int32)),
        point=jnp.asarray(np.array(ptids, np.int32)),
        pixel=jnp.asarray(np.stack(pixels)),
        valid=jnp.ones(len(ims), bool),
    )
    return state_gt, obs, tuple(segments)


def perturb_state(state_gt: BAState, seed=1, pose_rot=0.01, pose_t=0.01,
                  point_sigma=0.005, knot_sigma=1e-3):
    """Perturb all variable groups (reference: test/util.h:371-406)."""
    rng = np.random.default_rng(seed)
    m = state_gt.rig_q_global.shape[0]
    c = state_gt.cam_q_rig.shape[0]
    rig_q, rig_t = se3.retract_pose(
        state_gt.rig_q_global,
        state_gt.rig_t_global,
        jnp.asarray(
            np.concatenate(
                [rng.normal(0, pose_rot, (m, 3)), rng.normal(0, pose_t, (m, 3))], -1
            )
        ),
    )
    cam_tang = np.concatenate(
        [rng.normal(0, pose_rot, (c, 3)), rng.normal(0, pose_t, (c, 3))], -1
    )
    cam_tang[0] = 0.0  # gauge anchor stays fixed
    cam_q, cam_t = se3.retract_pose(
        state_gt.cam_q_rig, state_gt.cam_t_rig, jnp.asarray(cam_tang)
    )
    points = state_gt.points + jnp.asarray(
        rng.normal(0, point_sigma, state_gt.points.shape)
    )
    intr = []
    for model in state_gt.intrinsics:
        zero = protocol.intrinsics_tangent_zero(model)
        if zero.ndim == 3:  # grid tangent field
            tang = jnp.asarray(rng.normal(0, knot_sigma, zero.shape))
        else:
            scale = np.maximum(np.abs(np.asarray(model.params)), 1.0)
            tang = jnp.asarray(rng.normal(0, knot_sigma, zero.shape) * scale)
        intr.append(protocol.intrinsics_retract(model, tang))
    return BAState(
        rig_q_global=rig_q,
        rig_t_global=rig_t,
        cam_q_rig=cam_q,
        cam_t_rig=cam_t,
        points=points,
        intrinsics=tuple(intr),
    )


def reprojection_errors(state: BAState, obs, segments):
    """Per-observation reprojection error magnitudes (pixels)."""
    from camera_calibration_tpu.ba.state import transform_to_camera

    errs = []
    for ci, (s, c) in enumerate(segments):
        im = obs.imageset[s : s + c]
        pt = obs.point[s : s + c]
        cam = obs.camera[s : s + c]
        x_cam, _ = transform_to_camera(state, im, cam, state.points[pt])
        px, _, valid = protocol.project_points(
            state.intrinsics[ci], x_cam, init_xy=obs.pixel[s : s + c],
            max_iterations=50,
        )
        e = jnp.linalg.norm(px - obs.pixel[s : s + c], axis=-1)
        errs.append(jnp.where(valid, e, jnp.inf))
    return jnp.concatenate(errs)
