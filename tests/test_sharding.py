"""Multi-device sharding: the BA step must give identical results on a
sharded 8-device mesh and a single device."""

import jax
import jax.numpy as jnp
import numpy as np

import ba_harness
from camera_calibration_tpu.ba import lm_pcg
from camera_calibration_tpu.ba.dataset import pad_table, split_by_camera
from camera_calibration_tpu.parallel import sharding


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    state_gt, obs, segments = ba_harness.make_problem(
        seed=0, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=1)
    data = tuple(pad_table(s, 8) for s in split_by_camera(obs, segments))
    options = lm_pcg.BAOptions(max_pcg_iterations=25)
    step = lm_pcg.make_lm_step(options)
    warm = tuple(s.pixel for s in data)
    lam = jnp.asarray(-1.0, jnp.float64)

    # single device
    out_single = step(state0, warm, lam, data)
    cost_s, new_cost_s = float(out_single[4]), float(out_single[5])

    # sharded over 8 devices
    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state0, mesh)
    warm_sh = tuple(
        jax.device_put(s.pixel, d.pixel.sharding)
        for s, d in zip(data, data_sh)
    )
    lam_sh = sharding.replicate(lam, mesh)
    out_sh = step(state_sh, warm_sh, lam_sh, data_sh)
    cost_m, new_cost_m = float(out_sh[4]), float(out_sh[5])

    # The initial cost is a pure reduction — must match almost exactly.
    assert abs(cost_s - cost_m) < 1e-9 * max(1.0, abs(cost_s))
    # The post-step cost goes through 25 PCG iterations, which amplify
    # reduction-order differences; equal to ~1e-3 relative is agreement.
    assert abs(new_cost_s - new_cost_m) < 1e-3 * max(abs(new_cost_s), 1e-9), (
        new_cost_s, new_cost_m
    )
    np.testing.assert_allclose(
        np.asarray(out_single[0].points), np.asarray(out_sh[0].points),
        atol=1e-5,
    )


def test_sharded_full_optimize_converges():
    """Full LM optimize() on sharded tables reaches the optimum (not just
    one step)."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=5, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=6)
    data = tuple(pad_table(s, 8) for s in split_by_camera(obs, segments))
    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state0, mesh)
    options = lm_pcg.BAOptions(
        max_lm_iterations=25, max_pcg_iterations=60,
        cost_reduction_threshold=1e-8,
    )
    state, info = lm_pcg.optimize(state_sh, None, None, options, data=data_sh)
    err = np.asarray(ba_harness.reprojection_errors(state, obs, segments))
    assert np.median(err) < 1e-3, (np.median(err), info["final_cost"])


def test_grid_block_sharded_step_matches():
    """Intrinsics grid rows sharded across the mesh (TP-style grid-block
    partitioning, the second scaling axis of the north star) must give
    the same step as replicated intrinsics."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=9, n_points=40, n_poses=8, grid_res=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=10)
    data = tuple(pad_table(s, 8) for s in split_by_camera(obs, segments))
    options = lm_pcg.BAOptions(max_pcg_iterations=25)
    step = lm_pcg.make_lm_step(options)
    warm = tuple(s.pixel for s in data)
    lam = jnp.asarray(-1.0, jnp.float64)
    out_single = step(state0, warm, lam, data)

    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state0, mesh)
    state_sh = sharding.shard_grid_blocks(state_sh, mesh)
    assert len(state_sh.intrinsics[0].grid.sharding.device_set) == 8
    warm_sh = tuple(s.pixel for s in data_sh)
    lam_sh = sharding.replicate(lam, mesh)
    out_sh = step(state_sh, warm_sh, lam_sh, data_sh)

    assert abs(float(out_single[4]) - float(out_sh[4])) < 1e-9 * max(
        1.0, abs(float(out_single[4]))
    )
    assert abs(float(out_single[5]) - float(out_sh[5])) < 1e-3 * max(
        abs(float(out_single[5])), 1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_single[0].intrinsics[0].grid),
        np.asarray(out_sh[0].intrinsics[0].grid),
        atol=1e-6,
    )


import pytest


@pytest.mark.parametrize("n_cameras", [2, 3])
def test_sharded_stereo_rig_step_matches(n_cameras):
    """Sharded BA equivalence with a multi-camera rig (uneven per-camera
    tables; extrinsics + per-camera intrinsics grids in the state); the
    3-camera case covers rig bookkeeping beyond stereo."""
    state_gt, obs, segments = ba_harness.make_problem(
        seed=7, n_points=40, n_poses=8, n_cameras=n_cameras
    )
    state0 = ba_harness.perturb_state(state_gt, seed=8)
    data = tuple(pad_table(s, 8) for s in split_by_camera(obs, segments))
    options = lm_pcg.BAOptions(max_pcg_iterations=25)
    step = lm_pcg.make_lm_step(options)
    warm = tuple(s.pixel for s in data)
    lam = jnp.asarray(-1.0, jnp.float64)
    out_single = step(state0, warm, lam, data)

    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state0, mesh)
    warm_sh = tuple(s.pixel for s in data_sh)
    lam_sh = sharding.replicate(lam, mesh)
    out_sh = step(state_sh, warm_sh, lam_sh, data_sh)

    assert abs(float(out_single[4]) - float(out_sh[4])) < 1e-9 * max(
        1.0, abs(float(out_single[4]))
    )
    assert abs(float(out_single[5]) - float(out_sh[5])) < 1e-3 * max(
        abs(float(out_single[5])), 1e-9
    )
