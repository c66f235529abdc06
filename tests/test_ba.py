"""Bundle-adjustment convergence tests (synthetic perturbed-GT harness).

(reference test analog: central_generic_test.cc:60-89 TestOptimizeJointly)
"""

import numpy as np
import pytest

import ba_harness
from camera_calibration_tpu.ba import lm_pcg


@pytest.mark.parametrize(
    "solver",
    ["schur", "schur_poses", "pcg", "schur_direct", "schur_direct_points"],
)
def test_solver_modes_reconverge(solver):
    """All Schur/PCG/direct solver modes reach the same optimum.

    (reference analog: TestOptimizeJointly over all SchurModes,
    central_generic_test.cc:60-89)
    """
    state_gt, obs, segments = ba_harness.make_problem(
        seed=11, n_points=50, n_poses=10
    )
    state0 = ba_harness.perturb_state(state_gt, seed=12)
    options = lm_pcg.BAOptions(
        solver=solver, max_lm_iterations=25, max_pcg_iterations=80,
        cost_reduction_threshold=1e-7,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err) < 1e-3, (solver, np.median(err))
    report = info["report"]
    assert report.iterations == len(info["history"])
    assert report.accepted + report.rejected == report.iterations
    assert report.total_seconds > 0


def test_schur_direct_matches_tight_pcg():
    """The dense direct reduced solve equals an (almost-)exact PCG solve
    of the same damped normal equations (reference analog: the libvis
    Schur solvers are verified against a dense solve,
    libvis/src/libvis/test/lm_optimizer.cc:370,553)."""
    import jax
    import jax.numpy as jnp

    from camera_calibration_tpu.ba.dataset import split_by_camera
    from camera_calibration_tpu.ba.state import fix_gauge_mask, zero_tangent

    state_gt, obs, segments = ba_harness.make_problem(
        seed=21, n_points=40, n_poses=8, n_cameras=2
    )
    state = ba_harness.perturb_state(state_gt, seed=22)
    options = lm_pcg.BAOptions(max_pcg_iterations=4000,
                               pcg_rel_tolerance=1e-10)
    data = split_by_camera(obs, segments)
    data = lm_pcg.maybe_grid_layout(data, state, options)
    warm = tuple(seg.pixel for seg in data)
    blocks, _ = jax.jit(
        lambda s, w: lm_pcg.compute_blocks(data, s, w, options)
    )(state, warm)
    mask = fix_gauge_mask(state, ())
    grad = lm_pcg.apply_jtw(data, blocks, [b.r for b in blocks], state)
    grad = jax.tree_util.tree_map(lambda t, m: t * m, grad, mask)
    bd = lm_pcg.jtwj_block_diag(data, blocks, state)
    lam = jnp.asarray(1e-2, state.points.dtype)

    ref, _ = lm_pcg.pcg_solve(data, blocks, state, grad, bd, lam, mask,
                              options)
    for elim in ("poses", "points"):
        direct, n_iters = lm_pcg.schur_direct_solve(
            data, blocks, state, grad, bd, lam, mask, options,
            eliminate=elim,
        )
        assert int(n_iters) == 0
        for a, b in zip(
            jax.tree_util.tree_leaves(ref),
            jax.tree_util.tree_leaves(direct),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
            )


def test_mono_ba_reconverges():
    state_gt, obs, segments = ba_harness.make_problem(
        seed=0, n_points=60, n_poses=12
    )
    state0 = ba_harness.perturb_state(state_gt, seed=1)

    err0 = np.asarray(ba_harness.reprojection_errors(state0, obs, segments))
    assert np.median(err0) > 0.1  # perturbation is visible

    options = lm_pcg.BAOptions(
        max_lm_iterations=25, max_pcg_iterations=60,
        cost_reduction_threshold=1e-7,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    assert any(h["accepted"] for h in info["history"])

    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.isfinite(err).all()
    assert np.median(err) < 1e-3, (np.median(err), info["final_cost"])


def test_rig_ba_reconverges():
    state_gt, obs, segments = ba_harness.make_problem(
        seed=2, n_points=50, n_poses=10, n_cameras=2
    )
    state0 = ba_harness.perturb_state(state_gt, seed=3)
    options = lm_pcg.BAOptions(
        max_lm_iterations=30, max_pcg_iterations=60,
        cost_reduction_threshold=1e-7,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err) < 1e-3, (np.median(err), info["final_cost"])


def test_parametric_ba_reconverges():
    """BA over a parametric (thin-prism-fisheye) intrinsics model."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=4, n_points=60, n_poses=12, model_kind="tpf"
    )
    state0 = ba_harness.perturb_state(state_gt, seed=5, knot_sigma=2e-4)
    err0 = np.asarray(ba_harness.reprojection_errors(state0, obs, segments))
    assert np.median(err0) > 0.05
    options = lm_pcg.BAOptions(
        max_lm_iterations=30, max_pcg_iterations=80,
        cost_reduction_threshold=1e-8,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err) < 1e-3, (np.median(err), info["final_cost"])


def test_noncentral_ba_reconverges():
    """BA with the NoncentralGeneric (per-pixel line) model.

    (reference analog: noncentral_generic_test.cc:111)
    """
    import jax.numpy as jnp

    from camera_calibration_tpu.models import noncentral_generic as ncg
    from camera_calibration_tpu.models.base import replace as mreplace
    from camera_calibration_tpu.ba.state import BAState

    state_gt, obs, segments = ba_harness.make_problem(
        seed=6, n_points=50, n_poses=10
    )
    # GT noncentral model: central grid + a small smooth origin field.
    central = state_gt.intrinsics[0]
    gh, gw = central.grid.shape[:2]
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    origins = np.stack(
        [0.002 * np.sin(xx / 2.0), 0.002 * np.cos(yy / 2.0), np.zeros_like(xx, float)],
        -1,
    )
    nc_model = ncg.NoncentralGenericModel(
        direction_grid=central.grid,
        point_grid=jnp.asarray(origins),
        width=central.width, height=central.height,
        calibration_min_x=central.calibration_min_x,
        calibration_min_y=central.calibration_min_y,
        calibration_max_x=central.calibration_max_x,
        calibration_max_y=central.calibration_max_y,
    )
    state_gt = BAState(
        rig_q_global=state_gt.rig_q_global,
        rig_t_global=state_gt.rig_t_global,
        cam_q_rig=state_gt.cam_q_rig,
        cam_t_rig=state_gt.cam_t_rig,
        points=state_gt.points,
        intrinsics=(nc_model,),
    )
    # regenerate observations through the noncentral model
    from camera_calibration_tpu.ba.state import transform_to_camera
    from camera_calibration_tpu.ba.dataset import ObservationTable

    x_cam, _ = transform_to_camera(
        state_gt, obs.imageset, obs.camera, state_gt.points[obs.point]
    )
    px, _, valid = ncg.project_points(nc_model, x_cam, max_iterations=80)
    obs = ObservationTable(
        imageset=obs.imageset, camera=obs.camera, point=obs.point,
        pixel=px, valid=obs.valid & valid,
    )

    state0 = ba_harness.perturb_state(
        state_gt, seed=7, pose_rot=0.005, pose_t=0.005, point_sigma=0.002,
        knot_sigma=0.0,
    )
    # perturb both noncentral grids directly
    rng = np.random.default_rng(8)
    m0 = state0.intrinsics[0]
    from camera_calibration_tpu.ops import manifolds as man

    m0 = mreplace(
        m0,
        direction_grid=man.retract_direction(
            m0.direction_grid, jnp.asarray(rng.normal(0, 5e-4, (gh, gw, 2)))
        ),
        point_grid=m0.point_grid + jnp.asarray(rng.normal(0, 5e-4, (gh, gw, 3))),
    )
    state0 = BAState(
        rig_q_global=state0.rig_q_global, rig_t_global=state0.rig_t_global,
        cam_q_rig=state0.cam_q_rig, cam_t_rig=state0.cam_t_rig,
        points=state0.points, intrinsics=(m0,),
    )

    err0 = np.asarray(ba_harness.reprojection_errors(state0, obs, segments))
    assert np.median(err0[np.isfinite(err0)]) > 0.05

    options = lm_pcg.BAOptions(
        max_lm_iterations=30, max_pcg_iterations=80,
        cost_reduction_threshold=1e-8,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err[np.isfinite(err)]) < 2e-3, (
        np.median(err[np.isfinite(err)]), info["final_cost"])


def test_localize_only_mode():
    """Freezing points+intrinsics must only move poses (the reference's
    --localize_only mode)."""
    import jax.numpy as jnp

    state_gt, obs, segments = ba_harness.make_problem(
        seed=8, n_points=40, n_poses=8
    )
    # perturb only poses; localize-only must recover them
    state0 = ba_harness.perturb_state(
        state_gt, seed=9, pose_rot=0.01, pose_t=0.01, point_sigma=0.0,
        knot_sigma=0.0,
    )
    options = lm_pcg.BAOptions(
        max_lm_iterations=20, max_pcg_iterations=40,
        cost_reduction_threshold=1e-8,
        freeze=("points", "intrinsics"),
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    # points and intrinsics untouched
    np.testing.assert_array_equal(
        np.asarray(state.points), np.asarray(state0.points)
    )
    np.testing.assert_array_equal(
        np.asarray(state.intrinsics[0].grid),
        np.asarray(state0.intrinsics[0].grid),
    )
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err[np.isfinite(err)]) < 1e-3, np.median(err)


def test_block_chunk_streaming_matches():
    """Memory-bounded chunked block evaluation must be numerically
    identical to the fused evaluation (reference on-the-fly SchurMode
    semantics, lm_optimizer.h:297-307)."""
    import jax.numpy as jnp

    from camera_calibration_tpu.ba.dataset import pad_table, split_by_camera

    state_gt, obs, segments = ba_harness.make_problem(
        seed=14, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=15)
    data = tuple(pad_table(s, 256) for s in split_by_camera(obs, segments))
    warm = tuple(s.pixel for s in data)
    lam = jnp.asarray(-1.0, jnp.float64)

    out_a = lm_pcg.make_lm_step(lm_pcg.BAOptions(max_pcg_iterations=30))(
        state0, warm, lam, data
    )
    out_b = lm_pcg.make_lm_step(
        lm_pcg.BAOptions(max_pcg_iterations=30, block_chunk=256)
    )(state0, warm, lam, data)
    # ulp-level: chunked evaluation computes identical per-observation
    # values, but XLA may reassociate the final reductions differently
    # inside lax.map vs the fused program
    np.testing.assert_allclose(float(out_a[4]), float(out_b[4]), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(out_a[0].points), np.asarray(out_b[0].points), atol=1e-12
    )


def test_grid_layout_matches_flat():
    """Dense (M, P) grid-layout tables must optimize identically to flat
    tables (segment sums as axis reductions vs one-hot contractions)."""
    from camera_calibration_tpu.ba.dataset import split_by_camera, to_grid_layout

    state_gt, obs, segments = ba_harness.make_problem(
        seed=30, n_points=40, n_poses=6
    )
    state0 = ba_harness.perturb_state(state_gt, seed=31)
    opts = lm_pcg.BAOptions(max_lm_iterations=4, max_pcg_iterations=15)

    flat = split_by_camera(obs, segments)
    grid = tuple(
        to_grid_layout(seg, state0.rig_q_global.shape[0],
                       state0.points.shape[0])
        for seg in flat
    )
    assert grid[0].grid_shape == (6, 40)
    out_f, info_f = lm_pcg.optimize(state0, None, None, opts, data=flat)
    out_g, info_g = lm_pcg.optimize(state0, None, None, opts, data=grid)
    np.testing.assert_allclose(
        info_f["final_cost"], info_g["final_cost"], rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out_f.points), np.asarray(out_g.points), atol=1e-7
    )
    # and the auto heuristic inside optimize() picks the grid layout
    data_auto = lm_pcg.maybe_grid_layout(flat, state0, opts)
    assert data_auto[0].grid_shape == (6, 40)


def test_scan_carried_blocks_matches_two_pass():
    """The lax.scan path (block cache carried across iterations, one
    projection/Jacobian sweep per LM step) must converge like the classic
    two-pass step-per-call path."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=40, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=41)
    base = dict(max_lm_iterations=12, max_pcg_iterations=30,
                cost_reduction_threshold=1e-9)
    out1, info1 = lm_pcg.optimize(
        state0, obs, segments, lm_pcg.BAOptions(**base)
    )
    out4, info4 = lm_pcg.optimize(
        state0, obs, segments,
        lm_pcg.BAOptions(lm_steps_per_call=4, **base),
    )
    e1 = np.median(
        np.asarray(ba_harness.reprojection_errors(out1, obs, segments))
    )
    e4 = np.median(
        np.asarray(ba_harness.reprojection_errors(out4, obs, segments))
    )
    assert e1 < 1e-3 and e4 < 1e-3, (e1, e4)
    # the first iteration of both paths solves the identical system
    np.testing.assert_allclose(
        info1["history"][0]["cost"], info4["history"][0]["cost"], rtol=1e-6
    )
    np.testing.assert_allclose(
        info1["history"][0]["new_cost"], info4["history"][0]["new_cost"],
        rtol=1e-4,
    )


def test_verify_cost_guards():
    """Runtime numeric guards (the reference's VerifyCost /
    VerifyAnalyticalJacobian hooks, lm_optimizer.h:415-627)."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=20, n_points=40, n_poses=6
    )
    state0 = ba_harness.perturb_state(state_gt, seed=21)
    from camera_calibration_tpu.ba.dataset import split_by_camera

    data = split_by_camera(obs, segments)
    out = lm_pcg.verify_cost(
        state0, data, lm_pcg.BAOptions(max_pcg_iterations=10)
    )
    assert out["grad_rel_diff"] < 5e-2
    assert out["cost_block_pass_rel_diff"] < 1e-6

    # and through the optimize() toggle
    state, info = lm_pcg.optimize(
        state0, obs, segments,
        lm_pcg.BAOptions(max_lm_iterations=2, debug_verify=True),
    )
    assert len(info["history"]) >= 1


def test_cg_warm_start_converges_and_guard():
    """CG warm-starting across LM iterations (scan path) reaches the same
    optimum as cold starts, and _flat_cg returns immediately when x0 is
    already the exact solution; a worse-than-zero x0 falls back to the
    cold start (guard)."""
    import jax.numpy as jnp

    state_gt, obs, segments = ba_harness.make_problem(
        seed=50, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=51)
    base = dict(max_lm_iterations=12, max_pcg_iterations=30,
                cost_reduction_threshold=1e-9, lm_steps_per_call=4)
    out_cold, _ = lm_pcg.optimize(
        state0, obs, segments, lm_pcg.BAOptions(**base)
    )
    out_warm, _ = lm_pcg.optimize(
        state0, obs, segments,
        lm_pcg.BAOptions(cg_warm_start=True, **base),
    )
    e_cold = np.median(
        np.asarray(ba_harness.reprojection_errors(out_cold, obs, segments))
    )
    e_warm = np.median(
        np.asarray(ba_harness.reprojection_errors(out_warm, obs, segments))
    )
    assert e_cold < 1e-3 and e_warm < 1e-3, (e_cold, e_warm)

    # _flat_cg with the exact solution as x0 needs zero iterations
    import jax

    a = jnp.asarray(np.diag([4.0, 3.0, 2.0, 1.0]), jnp.float64) + 0.1
    b = jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float64)
    x_exact = jnp.linalg.solve(a, b)
    options = lm_pcg.BAOptions(max_pcg_iterations=50,
                               pcg_rel_tolerance=1e-6)
    x, iters = lm_pcg._flat_cg(
        lambda v: a @ v, lambda r: r, b, options, x0=x_exact
    )
    assert int(iters) == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_exact))

    # a catastrophically bad x0 must not be worse than the cold start
    x_bad = 1e6 * jnp.ones_like(b)
    x_g, it_g = lm_pcg._flat_cg(
        lambda v: a @ v, lambda r: r, b, options, x0=x_bad
    )
    x_c, it_c = lm_pcg._flat_cg(
        lambda v: a @ v, lambda r: r, b, options
    )
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_c), rtol=1e-10)


def test_cg_warm_start_noop_warns():
    """cg_warm_start silently does nothing on the step-per-call path and
    with direct solvers; optimize() must say so (advisor finding)."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=52, n_points=30, n_poses=6
    )
    state0 = ba_harness.perturb_state(state_gt, seed=53)
    with pytest.warns(UserWarning, match="cg_warm_start"):
        lm_pcg.optimize(
            state0, obs, segments,
            lm_pcg.BAOptions(cg_warm_start=True, max_lm_iterations=1),
        )
    with pytest.warns(UserWarning, match="cg_warm_start"):
        lm_pcg.optimize(
            state0, obs, segments,
            lm_pcg.BAOptions(cg_warm_start=True, solver="schur_direct",
                             lm_steps_per_call=2, max_lm_iterations=2),
        )


def test_four_camera_rig_ba_reconverges():
    """BA on a 4-camera fixed rig: joint re-convergence plus rig
    extrinsics recovery — camera-index bookkeeping (anchor freezing,
    per-camera gauge) has to hold beyond the stereo case (reference rig
    handling: joint_optimization.cc:789-814)."""
    from camera_calibration_tpu.ops import se3

    state_gt, obs, segments = ba_harness.make_problem(
        seed=31, n_points=50, n_poses=10, n_cameras=4
    )
    state0 = ba_harness.perturb_state(state_gt, seed=32)
    options = lm_pcg.BAOptions(
        max_lm_iterations=35, max_pcg_iterations=60,
        cost_reduction_threshold=1e-8,
    )
    state, info = lm_pcg.optimize(state0, obs, segments, options)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err) < 1e-3, (np.median(err), info["final_cost"])
    # Rig geometry recovery.  cam_q_rig alone is NOT gauge-free: each
    # camera's spline grid can absorb a rotation compensated in its
    # extrinsics (the per-camera rotation ambiguity the reference leaves
    # to damping, joint_optimization.cc:816-864), and camera 0's gauge
    # rotates the whole rig frame.  The invariants are (a) camera centers
    # in the rig frame (up to the free global scale) and (b) rig-frame
    # ray bundles up to ONE global rotation shared by all cameras.
    import jax.numpy as jnp

    from camera_calibration_tpu.models import central_generic as cg

    scale = float(
        np.linalg.norm(np.asarray(state.points[1] - state.points[0]))
        / max(np.linalg.norm(
            np.asarray(state_gt.points[1] - state_gt.points[0])), 1e-12)
    )
    xs = np.linspace(6, 58, 9)
    ys = np.linspace(6, 42, 7)
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))

    def rig_rays(st, c):
        d, _ = cg.unproject(st.intrinsics[c], px)
        r_c = np.asarray(se3.quat_to_matrix(st.cam_q_rig[c]))
        return np.asarray(d) @ r_c  # row-vector d_rig = R_c^T d_cam

    rec = np.concatenate([rig_rays(state, c) for c in range(4)])
    gt = np.concatenate([rig_rays(state_gt, c) for c in range(4)])
    u, _, vt = np.linalg.svd(rec.T @ gt)
    r0 = u @ np.diag([1, 1, np.sign(np.linalg.det(u @ vt))]) @ vt
    ang = np.degrees(np.arccos(np.clip(
        np.sum((rec @ r0) * gt, -1), -1, 1)))
    assert np.median(ang) < 0.05, np.median(ang)
    for c in range(1, 4):
        r_rec = np.asarray(se3.quat_to_matrix(state.cam_q_rig[c]))
        ctr_rec = -r_rec.T @ np.asarray(state.cam_t_rig[c]) / scale
        r_gt = np.asarray(se3.quat_to_matrix(state_gt.cam_q_rig[c]))
        ctr_gt = -r_gt.T @ np.asarray(state_gt.cam_t_rig[c])
        dt = np.linalg.norm(r0.T @ ctr_rec - ctr_gt)
        assert dt < 1e-3, (c, dt, scale)


def test_gain_ratio_lambda_schedule_converges():
    """The Nielsen gain-ratio λ schedule (BAOptions.lambda_schedule)
    reaches the same optimum as the reference's halve/double rule and
    actually changes the damping trajectory."""
    import jax.numpy as jnp

    state_gt, obs, segments = ba_harness.make_problem(
        seed=3, n_points=60, n_poses=12, noise_px=0.3
    )
    state0 = ba_harness.perturb_state(state_gt, seed=4)
    finals, lams = [], []
    for sched in ("halve_double", "gain_ratio"):
        opts = lm_pcg.BAOptions(
            max_lm_iterations=40, max_pcg_iterations=40,
            cost_reduction_threshold=1e-9, solver="schur",
            lambda_schedule=sched,
        )
        _, info = lm_pcg.optimize(state0, None, None, opts, data=(obs,))
        finals.append(info["final_cost"])
        step = lm_pcg.make_lm_scan(opts, 3)
        out = step(state0, (obs.pixel,), jnp.asarray(-1.0), (obs,))
        lams.append(float(out[2]))
    assert abs(finals[0] - finals[1]) / finals[0] < 1e-6, finals
    assert lams[0] != lams[1], lams  # the schedule is actually live
