"""PatchMatch stereo on a synthetic textured-plane scene.

(reference analog: the StereoDepthEstimation tool path,
stereo_depth_estimation.cc + patch_match_stereo kernels)
"""

import numpy as np
import jax.numpy as jnp

import ba_harness
from camera_calibration_tpu.stereo import patch_match as pms
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import protocol


def _texture(u, v):
    """Smooth pseudo-random texture on the plane."""
    return (
        0.5
        + 0.2 * np.sin(37.0 * u) * np.cos(29.0 * v)
        + 0.15 * np.sin(11.0 * u + 23.0 * v)
        + 0.15 * np.cos(53.0 * u - 17.0 * v)
    )


def _render_view(model, r, t, plane_z=2.0):
    """Render a camera's view of the textured plane z=plane_z (world)."""
    w, h = model.width, model.height
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2))
    dirs, _ = protocol.unproject(model, px)
    dirs = np.asarray(dirs)
    # camera pose: x_world = r.T (x_cam - t)  with x_cam = r x_world + t
    d_world = dirs @ r  # r.T applied to each row
    c_world = -r.T @ t
    s = (plane_z - c_world[2]) / d_world[:, 2]
    pts = c_world + s[:, None] * d_world
    img = _texture(pts[:, 0] * 0.8, pts[:, 1] * 0.8).reshape(h, w)
    return np.clip(img, 0, 1)


def test_patch_match_recovers_plane_depth():
    _, model = ba_harness.make_gt_model(w=96, h=72, grid_res=7)
    r_l = np.eye(3)
    t_l = np.zeros(3)
    r_r = np.eye(3)
    t_r = np.array([-0.3, 0.0, 0.0])  # 30cm baseline
    plane_z = 2.0
    img_l = _render_view(model, r_l, t_l, plane_z)
    img_r = _render_view(model, r_r, t_r, plane_z)

    # other_tr_ref: x_right = R x_left + t with left == world here
    opts = pms.PatchMatchOptions(
        iterations=24, patch_radius=3, min_depth=0.8, max_depth=5.0, seed=1
    )
    result = pms.compute_depth_map(
        jnp.asarray(img_l), jnp.asarray(img_r), model, model,
        (r_r, t_r), opts,
    )
    depth = np.asarray(result["depth"])
    cost = np.asarray(result["cost"])
    # depth along the ray: plane at z=2 -> depth = 2/dir_z
    w, h = model.width, model.height
    dirs = np.asarray(result["dirs"])
    gt_depth = plane_z / dirs[..., 2]
    interior = np.zeros_like(depth, bool)
    interior[8:-8, 8:-8] = True
    good = interior & np.isfinite(cost) & (cost < 0.2)
    assert good.mean() > 0.5, good.mean()
    rel = np.abs(depth[good] - gt_depth[good]) / gt_depth[good]
    assert np.median(rel) < 0.02, np.median(rel)
