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
        iterations=3, window_stride=2, mutation_count=1,
        patch_radius=3, min_depth=0.8, max_depth=5.0, seed=1,
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


def _render_slanted_view(model, r, t, a=0.6, z0=2.0):
    """Render a view of a textured SLANTED plane z = z0 + a·x (world)."""
    w, h = model.width, model.height
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2))
    dirs, _ = protocol.unproject(model, px)
    dirs = np.asarray(dirs)
    d_world = dirs @ r
    c_world = -r.T @ t
    # plane n·X = z0 with n = (-a, 0, 1): X_z - a X_x = z0
    denom = d_world[:, 2] - a * d_world[:, 0]
    s = (z0 - (c_world[2] - a * c_world[0])) / denom
    pts = c_world + s[:, None] * d_world
    img = _texture(pts[:, 0] * 1.1, pts[:, 1] * 1.1).reshape(h, w)
    return np.clip(img, 0, 1), s.reshape(h, w)


def test_slanted_patch_match_beats_plane_sweep():
    """On a strongly slanted surface the slanted-window PatchMatch must
    measurably beat the fronto-parallel plane sweep (the reference's
    motivation for per-pixel plane state, patch_match_stereo.h:64-75)."""
    _, model = ba_harness.make_gt_model(w=64, h=48, grid_res=7)
    r_r = np.eye(3)
    t_r = np.array([-0.3, 0.0, 0.0])
    img_l, depth_gt = _render_slanted_view(model, np.eye(3), np.zeros(3))
    img_r, _ = _render_slanted_view(model, r_r, t_r)

    opts = pms.PatchMatchOptions(
        iterations=4, num_levels=32, patch_radius=3, window_stride=2,
        mutation_count=1, min_depth=0.8, max_depth=6.0, seed=2,
    )
    res_pm = pms.compute_depth_map(
        jnp.asarray(img_l), jnp.asarray(img_r), model, model,
        (r_r, t_r), opts, algorithm="patch_match",
    )
    res_ps = pms.compute_depth_map(
        jnp.asarray(img_l), jnp.asarray(img_r), model, model,
        (r_r, t_r), opts, algorithm="plane_sweep",
    )
    interior = np.zeros(depth_gt.shape, bool)
    interior[10:-10, 10:-10] = True

    def med_rel(res):
        depth = np.asarray(res["depth"])
        cost = np.asarray(res["cost"])
        good = interior & np.isfinite(cost)
        rel = np.abs(depth[good] - depth_gt[good]) / depth_gt[good]
        return np.median(rel)

    e_pm = med_rel(res_pm)
    e_ps = med_rel(res_ps)
    assert e_pm < 0.02, (e_pm, e_ps)
    assert e_pm < 0.7 * e_ps, (e_pm, e_ps)
    # the recovered normals must reflect the slant (n ~ (-a,0,1)/|.|)
    n = np.asarray(res_pm["normals"])
    n_gt = np.array([0.6, 0.0, -1.0])
    n_gt = n_gt / np.linalg.norm(n_gt)  # camera-facing orientation
    dots = np.abs(n[interior] @ n_gt)
    assert np.median(dots) > 0.95, np.median(dots)


def test_stereo_post_filters():
    """Bilateral + connected-component post-filters."""
    rng = np.random.default_rng(0)
    inv_d = np.full((40, 50), 0.5)
    inv_d[10:20, 10:20] = 0.52  # coherent region
    noisy = inv_d + rng.normal(0, 0.01, inv_d.shape)
    guide = rng.uniform(0, 1, inv_d.shape)
    sm = np.asarray(pms.bilateral_filter(jnp.asarray(noisy),
                                         jnp.asarray(guide)))
    assert np.abs(sm - inv_d).std() < np.abs(noisy - inv_d).std()

    mask = np.ones(inv_d.shape, bool)
    speckle = np.full(inv_d.shape, 0.5)
    speckle[5:7, 30:32] = 5.0  # 4-px speckle at wild depth
    out = pms.connected_component_filter(mask, speckle, min_size=20)
    assert not out[5:7, 30:32].any()
    assert out[15, 15]
