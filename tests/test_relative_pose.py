"""Ramalingam-Sturm central+planar initializer: GT round-trip test.

(reference analog: relative_pose_initialization_test.cc:235-265 —
random GT poses -> collinear cloud construction -> pose recovery)
"""

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.init.relative_pose import central_planar_relative_pose
from camera_calibration_tpu.ops import se3


def _random_problem(seed, n=40):
    rng = np.random.default_rng(seed)
    # Camera optical center in the pattern (cloud2) frame, negative z.
    o = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                  rng.uniform(-1.5, -0.8)])
    poses = []
    for _ in range(2):
        r = np.asarray(
            se3.quat_to_matrix(se3.quat_exp(jnp.asarray(rng.normal(0, 0.15, 3))))
        )
        t = rng.normal(0, 0.15, 3)
        poses.append((r, t))

    clouds = np.zeros((3, n, 2))
    for i in range(n):
        # Ray through O hitting the pattern plane (z=0) at a random point.
        p2 = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 0.0])
        d = p2 - o
        clouds[2, i] = p2[:2]
        for k, (r, t) in enumerate(poses):
            # Intersect the ray with the plane {R p + t : p_z = 0}:
            # solve for s with e3ᵀ Rᵀ (o + s d - t) = 0.
            nrm = r[:, 2]  # plane normal in cloud2 coords
            s = np.dot(nrm, t - o) / np.dot(nrm, d)
            x = o + s * d
            p = r.T @ (x - t)
            assert abs(p[2]) < 1e-9
            clouds[k, i] = p[:2]
    return o, poses, clouds


def test_central_planar_recovers_pose():
    for seed in range(3):
        o_gt, poses, clouds = _random_problem(seed)
        out = central_planar_relative_pose(jnp.asarray(clouds))
        assert bool(out["ok"]), seed
        np.testing.assert_allclose(
            np.asarray(out["optical_center"]), o_gt, atol=1e-6
        )
        for key_r, key_t, (r_gt, t_gt) in [
            ("r0", "t0", poses[0]),
            ("r1", "t1", poses[1]),
        ]:
            np.testing.assert_allclose(np.asarray(out[key_r]), r_gt, atol=1e-6)
            np.testing.assert_allclose(np.asarray(out[key_t]), t_gt, atol=1e-6)


def test_central_planar_masked_rows():
    o_gt, poses, clouds = _random_problem(7, n=30)
    # append garbage rows with zero weight
    clouds_pad = np.concatenate([clouds, np.ones((3, 6, 2)) * 99.0], axis=1)
    w = np.concatenate([np.ones(30), np.zeros(6)])
    out = central_planar_relative_pose(jnp.asarray(clouds_pad), jnp.asarray(w))
    assert bool(out["ok"])
    np.testing.assert_allclose(np.asarray(out["optical_center"]), o_gt, atol=1e-6)


def test_central_3d_recovers_pose():
    """(reference analog: the central+3D variant in
    relative_pose_initialization_test.cc)"""
    from camera_calibration_tpu.init.relative_pose import central_3d_relative_pose

    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        # camera center in cloud1's frame
        o = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                      rng.uniform(-1.6, -0.9)])
        r_gt = np.asarray(
            se3.quat_to_matrix(se3.quat_exp(jnp.asarray(rng.normal(0, 0.2, 3))))
        )
        t_gt = rng.normal(0, 0.2, 3)
        n = 40
        clouds = np.zeros((2, n, 3))
        for i in range(n):
            # random ray through O; two 3D target points on it, one per cloud
            d = rng.normal(0, 1, 3)
            d /= np.linalg.norm(d)
            if d[2] < 0:
                d = -d
            s1 = rng.uniform(0.8, 2.0)
            p1 = o + s1 * d  # point of cloud1, in cloud1's frame
            s0 = rng.uniform(0.8, 2.0)
            x0 = o + s0 * d  # point of cloud0, in cloud1's frame
            p0 = r_gt.T @ (x0 - t_gt)  # cloud0's own frame
            clouds[1, i] = p1
            clouds[0, i] = p0
        out = central_3d_relative_pose(jnp.asarray(clouds))
        assert bool(out["ok"]), seed
        np.testing.assert_allclose(np.asarray(out["r"]), r_gt, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["t"]), t_gt, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["optical_center"]), o,
                                   atol=1e-6)


# --------------------- noncentral variants ---------------------


def _rand_rot_np(rng, max_angle=0.7):
    import numpy as np
    a = rng.normal(0, 1, 3)
    a /= np.linalg.norm(a)
    th = rng.uniform(0.1, max_angle)
    k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * k @ k


def _noncentral_lines(rng, n):
    import numpy as np
    o = rng.uniform(-0.5, 0.5, (n, 3))
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d *= np.sign(d[:, 2:3] + 1e-12)
    return o, d


def test_noncentral_3d_relative_pose():
    """(reference analog: relative_pose_initialization_test.cc noncentral
    3D variant — random GT poses, collinear cloud construction)"""
    import numpy as np
    from camera_calibration_tpu.init import relative_pose as rp

    rng = np.random.default_rng(7)
    n = 40
    o, d = _noncentral_lines(rng, n)
    rs = [_rand_rot_np(rng) for _ in range(3)]
    ts = [rng.uniform(-0.3, 0.3, 3) + np.array([0, 0, 1.5]) for _ in range(3)]
    clouds = []
    for k in range(3):
        s = rng.uniform(1.0, 2.0, n)
        x = o + s[:, None] * d
        clouds.append((x - ts[k]) @ rs[k])
    out = rp.noncentral_3d_relative_pose(np.stack(clouds))
    assert out["ok"]
    r20 = rs[2].T @ rs[0]
    t20 = rs[2].T @ (ts[0] - ts[2])
    r21 = rs[2].T @ rs[1]
    t21 = rs[2].T @ (ts[1] - ts[2])
    np.testing.assert_allclose(out["r0"], r20, atol=1e-6)
    np.testing.assert_allclose(out["t0"], t20, atol=1e-6)
    np.testing.assert_allclose(out["r1"], r21, atol=1e-6)
    np.testing.assert_allclose(out["t1"], t21, atol=1e-6)


def test_noncentral_planar_relative_pose():
    """Planar variant returns the mirror candidate pair, one matching GT —
    WITHOUT the reference's ground-truth disambiguation hack
    (noncentral_camera_planar_target.cc:261,280, algorithms.h:59-60)."""
    import numpy as np
    from camera_calibration_tpu.init import relative_pose as rp

    rng = np.random.default_rng(8)
    n = 60
    o, d = _noncentral_lines(rng, n)
    rs = [_rand_rot_np(rng) for _ in range(3)]
    ts = [rng.uniform(-0.3, 0.3, 3) + np.array([0, 0, 1.5]) for _ in range(3)]
    clouds = []
    for k in range(3):
        nrm = rs[k][:, 2]
        s = (nrm @ ts[k] - o @ nrm) / (d @ nrm)
        x = o + s[:, None] * d
        p = (x - ts[k]) @ rs[k]
        assert np.abs(p[:, 2]).max() < 1e-9
        clouds.append(p[:, :2])
    out = rp.noncentral_planar_relative_pose(np.stack(clouds))
    assert out["ok"], out.get("residual")
    r20 = rs[2].T @ rs[0]
    t20 = rs[2].T @ (ts[0] - ts[2])
    errs = []
    for c in out["candidates"]:
        errs.append(
            np.abs(c["r0"] - r20).max() + np.abs(c["t0"] - t20).max()
        )
    assert min(errs) < 1e-6, errs
    # the two candidates are genuinely distinct (mirror pair)
    assert max(errs) > 1e-2


def test_noncentral_planar_relative_pose_noise():
    import numpy as np
    from camera_calibration_tpu.init import relative_pose as rp

    rng = np.random.default_rng(9)
    n = 120
    o, d = _noncentral_lines(rng, n)
    rs = [_rand_rot_np(rng) for _ in range(3)]
    ts = [rng.uniform(-0.3, 0.3, 3) + np.array([0, 0, 1.5]) for _ in range(3)]
    clouds = []
    for k in range(3):
        nrm = rs[k][:, 2]
        s = (nrm @ ts[k] - o @ nrm) / (d @ nrm)
        x = o + s[:, None] * d
        p = (x - ts[k]) @ rs[k]
        clouds.append(p[:, :2] + rng.normal(0, 1e-4, (n, 2)))
    out = rp.noncentral_planar_relative_pose(np.stack(clouds))
    assert out["ok"], out.get("residual")
    r20 = rs[2].T @ rs[0]
    t20 = rs[2].T @ (ts[0] - ts[2])
    errs = [
        np.abs(c["r0"] - r20).max() + np.abs(c["t0"] - t20).max()
        for c in out["candidates"]
    ]
    assert min(errs) < 0.05, errs
