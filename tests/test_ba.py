"""Bundle-adjustment convergence tests (synthetic perturbed-GT harness).

(reference test analog: central_generic_test.cc:60-89 TestOptimizeJointly)
"""

import numpy as np

import ba_harness
from camera_calibration_tpu.ba import lm_pcg


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
