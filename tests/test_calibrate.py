"""End-to-end calibration pipeline test: pyramid + outliers + metric scale.

(reference flow analog: calibration.cc:918-1140)
"""

import jax.numpy as jnp
import numpy as np

import ba_harness
from camera_calibration_tpu import calibrate as cal
from camera_calibration_tpu.ba.dataset import KnownGeometry, ObservationTable, split_by_camera
from camera_calibration_tpu.ba.state import BAState
from camera_calibration_tpu.ops import se3


def _grid_pattern_problem(seed=0, k=9, n_poses=10, w=64, h=48, cell=0.05):
    """Synthetic problem whose points form a regular pattern grid."""
    rng = np.random.default_rng(seed)
    _, model = ba_harness.make_gt_model(w, h, grid_res=7)
    cols, rows = np.meshgrid(np.arange(k), np.arange(k))
    pts = np.stack(
        [
            (cols.ravel() - k / 2) * cell,
            (rows.ravel() - k / 2) * cell,
            np.zeros(k * k),
        ],
        -1,
    )
    geometry = KnownGeometry(
        cell_length_in_meters=cell,
        feature_id_to_position={
            i: (int(cols.ravel()[i]), int(rows.ravel()[i])) for i in range(k * k)
        },
    )
    fid_to_idx = {i: i for i in range(k * k)}

    rig_q, rig_t = [], []
    for _ in range(n_poses):
        rig_q.append(np.asarray(se3.quat_exp(jnp.asarray(rng.normal(0, 0.1, 3)))))
        rig_t.append(
            [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.5, 0.8)]
        )
    state_gt = BAState(
        rig_q_global=jnp.asarray(np.stack(rig_q)),
        rig_t_global=jnp.asarray(np.array(rig_t)),
        cam_q_rig=jnp.asarray([[1.0, 0, 0, 0]]),
        cam_t_rig=jnp.zeros((1, 3)),
        points=jnp.asarray(pts),
        intrinsics=(model,),
    )

    from camera_calibration_tpu.models import protocol

    ims, ptids, pixels = [], [], []
    for mi in range(n_poses):
        x_cam = np.asarray(
            se3.quat_rotate(jnp.asarray(rig_q[mi]), jnp.asarray(pts))
        ) + np.array(rig_t[mi])
        px, _, valid = protocol.project_points(
            model, jnp.asarray(x_cam), max_iterations=80
        )
        px, valid = np.asarray(px), np.asarray(valid)
        inside = valid & (px[:, 0] > 1) & (px[:, 0] < w - 1) & (px[:, 1] > 1) & (px[:, 1] < h - 1)
        for pi in np.nonzero(inside)[0]:
            ims.append(mi)
            ptids.append(pi)
            pixels.append(px[pi])
    obs = ObservationTable(
        imageset=jnp.asarray(np.array(ims, np.int32)),
        camera=jnp.zeros(len(ims), jnp.int32),
        point=jnp.asarray(np.array(ptids, np.int32)),
        pixel=jnp.asarray(np.stack(pixels)),
        valid=jnp.ones(len(ims), bool),
    )
    return state_gt, obs, ((0, len(ims)),), geometry, fid_to_idx


def test_full_calibrate_pipeline():
    state_gt, obs, segments, geometry, fid_to_idx = _grid_pattern_problem()
    data = split_by_camera(obs, segments)

    # Inject a few gross outliers into the measured pixels.
    pix = np.asarray(data[0].pixel).copy()
    n = pix.shape[0]
    out_idx = np.arange(0, n, max(1, n // 12))[:10]
    pix[out_idx] += 13.0
    data = (
        ObservationTable(
            imageset=data[0].imageset,
            camera=data[0].camera,
            point=data[0].point,
            pixel=jnp.asarray(pix),
            valid=data[0].valid,
        ),
    )

    # Initial state: coarse intrinsics + perturbed poses/points + wrong scale.
    state0 = ba_harness.perturb_state(state_gt, seed=7, pose_rot=0.01,
                                      pose_t=0.005, point_sigma=0.002,
                                      knot_sigma=5e-4)
    coarse = cal.resample_central_generic(state0.intrinsics[0], (5, 5))
    state0 = BAState(
        rig_q_global=state0.rig_q_global,
        rig_t_global=state0.rig_t_global * 1.3,  # wrong metric scale
        cam_q_rig=state0.cam_q_rig,
        cam_t_rig=state0.cam_t_rig,
        points=state0.points * 1.3,
        intrinsics=(coarse,),
    )

    options = cal.CalibrateOptions(
        num_pyramid_levels=2,
        approx_pixels_per_cell=10,
        outlier_removal_factor=3.0,
        final_iterations=40,
    )
    state, data2, report = cal.calibrate(
        state0,
        data,
        options,
        known_geometries=[geometry],
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
    )

    assert report["outliers_removed"] >= 8, report["outliers_removed"]
    assert report["reprojection_error_median"] < 0.01, report
    # metric scale recovered (1/1.3 ≈ 0.769)
    assert abs(report["scale_factor"] - 1 / 1.3) < 0.02, report["scale_factor"]


def test_full_calibrate_parametric_model():
    """model_kind plumbing: dense init -> parametric fit -> BA (the
    reference's parametric calibration path, calibration.cc:644/733)."""
    import test_dense_init as tdi
    from camera_calibration_tpu.init.dense_init import (
        DenseInitializer, DenseInitOptions,
    )
    from camera_calibration_tpu.init.state_init import build_ba_state
    from camera_calibration_tpu import calibrate as cal
    from camera_calibration_tpu.models.parametric import (
        CentralThinPrismFisheyeModel,
    )

    ds, camgt, gt_poses = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=10, k=12, w=320, h=240
    )
    init = DenseInitializer(
        ds, 0, DenseInitOptions(
            max_initialization_attempts=100, seed=3,
            min_matched_area_accept=0.15,
        ),
    )
    res = init.run()
    assert res is not None
    state, data, fid, used = build_ba_state(
        ds, [res], (6, 6), model_kind="central_thin_prism_fisheye"
    )
    assert isinstance(state.intrinsics[0], CentralThinPrismFisheyeModel)
    opts = cal.CalibrateOptions(
        num_pyramid_levels=1, final_iterations=40, outlier_removal_factor=8.0
    )
    state, data, rep = cal.calibrate(
        state, data, opts, known_geometries=ds.known_geometries,
        feature_id_to_point_index=fid,
    )
    assert rep["reprojection_error_median"] < 0.05, rep


def test_calibration_report_noncentral_extras(tmp_path):
    """Voronoi diagram + grid locations + line offsets + .obj export
    (reference: calibration_report.cc:354, 934-936)."""
    import ba_harness
    from camera_calibration_tpu.ba.dataset import split_by_camera
    from camera_calibration_tpu.report.calibration_report import (
        create_calibration_report,
    )

    # reuse the noncentral BA harness problem (state with a noncentral
    # model + observations)
    import test_ba as tb
    import jax.numpy as jnp
    import numpy as np
    from camera_calibration_tpu.models import noncentral_generic as ncg
    from camera_calibration_tpu.models import central_generic as cg

    state_gt, obs, segments = ba_harness.make_problem(
        seed=6, n_points=40, n_poses=6
    )
    central = state_gt.intrinsics[0]
    noncentral = ncg.NoncentralGenericModel(
        direction_grid=central.grid,
        point_grid=jnp.asarray(
            0.01 * np.random.default_rng(0).normal(
                0, 1, central.grid.shape
            )
        ),
        width=central.width, height=central.height,
        calibration_min_x=central.calibration_min_x,
        calibration_min_y=central.calibration_min_y,
        calibration_max_x=central.calibration_max_x,
        calibration_max_y=central.calibration_max_y,
    )
    state = type(state_gt)(
        rig_q_global=state_gt.rig_q_global,
        rig_t_global=state_gt.rig_t_global,
        cam_q_rig=state_gt.cam_q_rig,
        cam_t_rig=state_gt.cam_t_rig,
        points=state_gt.points,
        intrinsics=(noncentral,),
    )
    data = split_by_camera(obs, segments)
    create_calibration_report(str(tmp_path), state, data)
    for suffix in ("_info.txt", "_error_directions.png",
                   "_grid_point_locations.png", "_line_offsets.png",
                   "_lines.obj"):
        assert (tmp_path / f"report_camera0{suffix}").exists(), suffix
    obj = (tmp_path / "report_camera0_lines.obj").read_text()
    assert obj.count("\nl ") > 100


def test_mixed_precision_polish_certifies_error():
    """f32-on-chip phases + f64 CPU polish as ONE calibrate run
    (reference: f32 CUDA BA then 10 CPU f64 iterations,
    calibration.cc:1127-1133).  On noisy data the polish must not
    increase — and should certify or reduce — the final cost/median."""
    import jax.numpy as jnp

    state_gt, obs, segments, geometry, fid_to_idx = _grid_pattern_problem(
        seed=5, n_poses=10
    )
    data = split_by_camera(obs, segments)
    # measurement noise so the f32/f64 floors are distinguishable
    rng = np.random.default_rng(11)
    pix = np.asarray(data[0].pixel) + rng.normal(0, 0.05, data[0].pixel.shape)
    data = (
        ObservationTable(
            imageset=data[0].imageset,
            camera=data[0].camera,
            point=data[0].point,
            pixel=jnp.asarray(pix),
            valid=data[0].valid,
        ),
    )

    state0 = ba_harness.perturb_state(state_gt, seed=3, pose_rot=0.01,
                                      pose_t=0.005, point_sigma=0.002,
                                      knot_sigma=5e-4)
    # f32 inputs: the dtype the accelerator path runs
    state0 = cal.cast_floating(state0, jnp.float32)
    data32 = cal.cast_floating(data, jnp.float32)

    options = cal.CalibrateOptions(
        num_pyramid_levels=1,
        outlier_removal_factor=0.0,
        final_iterations=25,
        polish_iterations=6,
    )
    state, data2, report = cal.calibrate(
        state0, data32, options,
        known_geometries=[geometry],
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
    )
    # polish ran and handed back a float64 state
    assert state.points.dtype == jnp.float64
    assert "polish_cost" in report, report
    # certify-or-reduce: the f64 cost never exceeds the f32 result
    # (small slack for the f32->f64 re-evaluation of the same state)
    assert report["polish_cost"] <= report["final_cost_f32"] * 1.001 + 1e-9, report
    # still a good calibration despite the injected noise
    assert report["reprojection_error_median"] < 0.1, report


def test_mixed_precision_config_is_scoped():
    """calibrate(dtype=mixed) must not leak jax_enable_x64 /
    jax_default_device: a plain f32 optimize() afterwards in the same
    process still stages f32 on the default backend.  (The reference's
    polish is a *local* solver call, calibration.cc:1127-1133.)"""
    import jax
    import jax.numpy as jnp

    from camera_calibration_tpu.ba import lm_pcg

    prev_x64 = bool(jax.config.jax_enable_x64)
    prev_dev = jax.config.jax_default_device
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_default_device", None)
    try:
        state_gt, obs, segments, geometry, fid_to_idx = _grid_pattern_problem(
            seed=6, n_poses=8
        )
        data = split_by_camera(obs, segments)
        state0 = ba_harness.perturb_state(state_gt, seed=4, pose_rot=0.005,
                                          pose_t=0.002, point_sigma=0.001,
                                          knot_sigma=2e-4)
        state0 = cal.cast_floating(state0, jnp.float32)
        data32 = cal.cast_floating(data, jnp.float32)
        options = cal.CalibrateOptions(
            num_pyramid_levels=1, outlier_removal_factor=0.0,
            final_iterations=6, polish_iterations=2,
        )
        state, _, report = cal.calibrate(
            state0, data32, options,
            known_geometries=[geometry],
            feature_id_to_point_index=fid_to_idx,
            log=lambda *a: None,
        )
        # polish actually ran and produced a float64 state
        assert state.points.dtype == jnp.float64
        assert "polish_cost" in report, report
        # ... but the process-global config is back to what it was
        assert not jax.config.jax_enable_x64
        assert jax.config.jax_default_device is None
        # fresh arrays stage f32 on the default backend again
        fresh = jnp.asarray(np.arange(4, dtype=np.float64))
        assert fresh.dtype == jnp.float32
        assert fresh.devices() == jax.jit(lambda x: x)(
            jnp.zeros(1)
        ).devices()
        # and a plain f32 optimize() still runs f32 end to end
        st2, info = lm_pcg.optimize(
            state0, None, None,
            lm_pcg.BAOptions(max_lm_iterations=2), data=data32,
        )
        assert st2.points.dtype == jnp.float32
        assert np.isfinite(info["final_cost"])
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
        jax.config.update("jax_default_device", prev_dev)


def test_resample_is_near_exact():
    """Model→model resampling is a linear solve (calibrate.
    _linear_grid_resample): the resampled model must reproduce the old
    model's unprojection to well below calibration noise, for BOTH grid
    families (reference ResampleModel, calibration.cc:373-472, uses an
    iterative refit / bilinear interp; the linear solve is tighter)."""
    import jax.numpy as jnp

    from camera_calibration_tpu.models import central_generic as cg
    from camera_calibration_tpu.models import noncentral_generic as ncg

    rng = np.random.default_rng(3)
    w, h = 320, 240
    gh, gw = 9, 11
    yy, xx = np.meshgrid(np.linspace(-0.5, 0.5, gh),
                         np.linspace(-0.6, 0.6, gw), indexing="ij")
    dirs = np.stack([np.sin(xx), np.sin(yy), np.cos(xx) * np.cos(yy)], -1)
    dirs += rng.normal(0, 1e-3, dirs.shape)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    model = cg.CentralGenericModel(
        grid=jnp.asarray(dirs), width=w, height=h,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=w - 1, calibration_max_y=h - 1,
    )
    up = cal.resample_central_generic(model, (15, 12))
    xs = np.arange(4, w - 4, 3) + 0.5
    ys = np.arange(4, h - 4, 3) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))
    d0, v0 = cg.unproject(model, px)
    d1, v1 = cg.unproject(up, px)
    m = np.asarray(v0 & v1)
    ang = np.degrees(np.arccos(np.clip(
        np.sum(np.asarray(d0) * np.asarray(d1), -1), -1, 1)))
    # representation floor: the 1e-3 knot noise puts sub-cell detail in
    # the surface; 5e-4 deg ~ 0.003 px here, far below calibration noise
    assert np.median(ang[m]) < 2e-3, np.median(ang[m])
    assert ang[m].max() < 5e-2, ang[m].max()

    # noncentral: direction AND point grids carried through the resample
    origins = np.stack(
        [0.1 * (yy - yy.mean()), -0.08 * (xx - xx.mean()), 0.02 * xx], -1
    )
    nc = ncg.NoncentralGenericModel(
        direction_grid=jnp.asarray(dirs), point_grid=jnp.asarray(origins),
        width=w, height=h,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=w - 1, calibration_max_y=h - 1,
    )
    nc_up = cal.resample_noncentral_generic(nc, (15, 12))
    d0, o0, v0 = ncg.unproject(nc, px)
    d1, o1, v1 = ncg.unproject(nc_up, px)
    m = np.asarray(v0 & v1)
    ang = np.degrees(np.arccos(np.clip(
        np.sum(np.asarray(d0) * np.asarray(d1), -1), -1, 1)))
    assert np.median(ang[m]) < 2e-3, np.median(ang[m])
    # line anchors: compare perpendicular offset of the resampled line
    rel = np.asarray(o1) - np.asarray(o0)
    perp = rel - np.sum(rel * np.asarray(d0), -1, keepdims=True) * np.asarray(d0)
    assert np.median(np.linalg.norm(perp, axis=-1)[m]) < 1e-4
