"""P3P + RANSAC localization tests (reference analog: opengv_test.cc:49)."""

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.init.p3p import p3p_grunert, ransac_p3p
from camera_calibration_tpu.ops import se3


def _random_pose(rng):
    r = np.asarray(
        se3.quat_to_matrix(se3.quat_exp(jnp.asarray(rng.normal(0, 0.4, 3))))
    )
    t = rng.normal(0, 1.0, 3)
    return r, t


def test_p3p_minimal_recovers_gt():
    hits = 0
    for seed in range(10):
        rng = np.random.default_rng(seed)
        r_gt, t_gt = _random_pose(rng)
        # Points in front of the camera: x_cam with z in [2, 5]
        x_cam = np.stack(
            [rng.uniform(-1, 1, 3), rng.uniform(-1, 1, 3), rng.uniform(2, 5, 3)],
            -1,
        )
        bearings = x_cam / np.linalg.norm(x_cam, axis=-1, keepdims=True)
        points = x_cam @ r_gt.T + t_gt  # world = R x_cam + t
        sols = p3p_grunert(bearings, points)
        assert sols, f"no solutions for seed {seed}"
        errs = [
            np.abs(r - r_gt).max() + np.abs(t - t_gt).max() for r, t in sols
        ]
        if min(errs) < 1e-6:
            hits += 1
    assert hits >= 9, hits  # allow rare degenerate configuration


def test_ransac_p3p_with_outliers():
    rng = np.random.default_rng(3)
    r_gt, t_gt = _random_pose(rng)
    n = 60
    x_cam = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 5, n)], -1
    )
    bearings = x_cam / np.linalg.norm(x_cam, axis=-1, keepdims=True)
    points = x_cam @ r_gt.T + t_gt
    # corrupt 20% of the bearings
    n_out = n // 5
    bearings[:n_out] = rng.normal(0, 1, (n_out, 3))
    bearings[:n_out] /= np.linalg.norm(bearings[:n_out], axis=-1, keepdims=True)

    out = ransac_p3p(bearings, points, max_iterations=20, seed=1)
    assert out is not None
    r, t, inliers = out
    assert inliers.sum() >= n - n_out - 2
    np.testing.assert_allclose(r, r_gt, atol=1e-6)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)
