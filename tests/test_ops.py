"""Unit tests for the math substrate (ops/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camera_calibration_tpu.ops import bspline, dlt, linalg, losses, manifolds, se3


rng = np.random.default_rng(0)


# ------------------------------- B-spline -------------------------------


def _bspline_basis_ref(i, order, x):
    """Cox-de-Boor recursion (reference b_spline.h:36-43)."""
    if order == 0:
        return 1.0 if (i <= x < i + 1) else 0.0
    return (x - i) / order * _bspline_basis_ref(i, order - 1, x) + (
        i + order + 1 - x
    ) / order * _bspline_basis_ref(i + 1, order - 1, x)


def test_bspline_weights_match_cox_de_boor():
    for t in [0.0, 0.25, 0.6, 0.99]:
        w = np.asarray(bspline.cubic_bspline_weights(jnp.float64(t)))
        # Window k = -1..2 around floor(g); with g = t, basis i = k at x = t+... :
        # f(g) = sum_i c_i B_i(g) with B the cubic basis supported on [i, i+4);
        # contribution of control point (floor(g)-1+k) is B(floor(g)-1+k, 3, g+2)
        ref = [_bspline_basis_ref(k - 1, 3, t + 2.0) for k in range(4)]
        np.testing.assert_allclose(w, ref, atol=1e-12)
    # Partition of unity
    t = jnp.linspace(0.0, 0.999, 77)
    np.testing.assert_allclose(
        np.sum(np.asarray(bspline.cubic_bspline_weights(t)), -1), 1.0, atol=1e-12
    )


def test_bspline_surface_reproduces_linear():
    h, w = 8, 9
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    grid = jnp.asarray(np.stack([2.0 * xx - 1.0, 0.5 * yy + 3.0, xx + yy], -1))
    for gx, gy in [(1.0, 1.0), (3.3, 2.7), (w - 2.01, h - 2.01), (2.5, 4.5)]:
        v = np.asarray(bspline.eval_surface(grid, jnp.float64(gx), jnp.float64(gy)))
        np.testing.assert_allclose(
            v, [2.0 * gx - 1.0, 0.5 * gy + 3.0, gx + gy], atol=1e-9
        )


def test_bspline_derivative_matches_ad():
    knots = jnp.asarray(rng.standard_normal(12))
    g = jnp.float64(5.37)
    d_ad = jax.grad(lambda x: bspline.eval_1d(knots, x))(g)
    # via weight derivs
    b = bspline.window_base(g)
    win = jax.lax.dynamic_slice(knots, (b,), (4,))
    t = g - (b + 1)
    d_manual = jnp.dot(bspline.cubic_bspline_weight_derivs(t), win)
    np.testing.assert_allclose(d_ad, d_manual, atol=1e-10)


# ------------------------------- SE(3) -------------------------------


def test_quat_roundtrip_and_rotate():
    u = jnp.asarray(rng.standard_normal((50, 3)) * 0.8)
    q = se3.quat_exp(u)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(se3.quat_log(q)), np.asarray(u), atol=1e-9)
    v = jnp.asarray(rng.standard_normal((50, 3)))
    rv1 = se3.quat_rotate(q, v)
    rv2 = jnp.einsum("nij,nj->ni", se3.quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv2), atol=1e-10)
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    # same rotation up to sign
    dot = np.abs(np.sum(np.asarray(q2) * np.asarray(q), -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_se3_compose_inverse():
    q1 = se3.quat_exp(jnp.asarray(rng.standard_normal(3)))
    t1 = jnp.asarray(rng.standard_normal(3))
    q2 = se3.quat_exp(jnp.asarray(rng.standard_normal(3)))
    t2 = jnp.asarray(rng.standard_normal(3))
    x = jnp.asarray(rng.standard_normal(3))
    a = se3.se3_apply(q1, t1, se3.se3_apply(q2, t2, x))
    qc, tc = se3.se3_compose(q1, t1, q2, t2)
    b = se3.se3_apply(qc, tc, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    qi, ti = se3.se3_inverse(qc, tc)
    np.testing.assert_allclose(
        np.asarray(se3.se3_apply(qi, ti, b)), np.asarray(x), atol=1e-10
    )


def test_average_se3_recovers_common_pose():
    q = se3.quat_exp(jnp.asarray(rng.standard_normal(3)))
    t = jnp.asarray(rng.standard_normal(3))
    qs = jnp.tile(q[None], (5, 1))
    ts = jnp.tile(t[None], (5, 1))
    qa, ta = se3.average_se3(qs, ts)
    assert abs(float(jnp.abs(jnp.dot(qa, q))) - 1.0) < 1e-9
    np.testing.assert_allclose(np.asarray(ta), np.asarray(t), atol=1e-10)


# ------------------------------- manifolds -------------------------------


def test_direction_retract_properties():
    d = jnp.asarray(rng.standard_normal((30, 3)))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t1, t2 = manifolds.direction_tangents(d)
    for t in (t1, t2):
        np.testing.assert_allclose(
            np.sum(np.asarray(t) * np.asarray(d), -1), 0.0, atol=1e-12
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(t), axis=-1), 1.0, atol=1e-12
        )
    delta = jnp.asarray(rng.standard_normal((30, 2)) * 0.1)
    d2 = manifolds.retract_direction(d, delta)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d2), axis=-1), 1.0, atol=1e-12)
    # zero delta is identity
    np.testing.assert_allclose(
        np.asarray(manifolds.retract_direction(d, jnp.zeros((30, 2)))),
        np.asarray(d),
        atol=1e-12,
    )


def test_direction_local_offset_inverts_retract():
    d = jnp.asarray([0.1, -0.2, 1.0])
    d = d / jnp.linalg.norm(d)
    delta = jnp.asarray([0.05, -0.03])
    d2 = manifolds.retract_direction(d, delta)
    back = manifolds.direction_local_offset(d, d2)
    # retract normalizes, local_offset maps to tangent plane: consistent to 1st order
    d3 = manifolds.retract_direction(d, back)
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d2), atol=1e-12)


def test_line_retract():
    d = jnp.asarray([0.0, 0.0, 1.0])
    o = jnp.asarray([1.0, 2.0, 3.0])
    nd, no = manifolds.retract_line(d, o, jnp.asarray([0.0, 0.0, 0.1, 0.2, 5.0]))
    np.testing.assert_allclose(np.asarray(nd), [0.0, 0.0, 1.0], atol=1e-12)
    assert abs(float(no[2]) - 8.0) < 1e-12


# ------------------------------- DLT -------------------------------


def test_homography_dlt_exact():
    h_true = np.array(
        [[1.1, 0.02, -3.0], [-0.05, 0.95, 2.0], [1e-4, -2e-4, 1.0]], dtype=np.float64
    )
    src = rng.uniform(-50, 50, (12, 2))
    p = np.concatenate([src, np.ones((12, 1))], -1) @ h_true.T
    dst = p[:, :2] / p[:, 2:3]
    h_est = np.asarray(dlt.homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    h_norm = h_true / np.linalg.norm(h_true)
    np.testing.assert_allclose(h_est, h_norm * np.sign(h_norm[2, 2]), atol=1e-8)
    # masked rows ignored
    src_pad = np.concatenate([src, rng.uniform(-5, 5, (4, 2))], 0)
    dst_pad = np.concatenate([dst, rng.uniform(-5, 5, (4, 2))], 0)
    w = np.concatenate([np.ones(12), np.zeros(4)])
    h_est2 = np.asarray(
        dlt.homography_dlt(jnp.asarray(src_pad), jnp.asarray(dst_pad), jnp.asarray(w))
    )
    np.testing.assert_allclose(h_est2, h_est, atol=1e-8)


def test_apply_homography_identity():
    pts = jnp.asarray(rng.uniform(-1, 1, (7, 2)))
    out = dlt.apply_homography(jnp.eye(3), pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-12)


# ------------------------------- losses -------------------------------


def test_losses_basic():
    r = jnp.asarray([0.1, 0.5, 2.0, 10.0])
    sq = r * r
    tau = 1.0
    c = np.asarray(losses.huber_cost(sq, tau))
    np.testing.assert_allclose(c[:2], 0.5 * np.asarray(sq)[:2])
    np.testing.assert_allclose(c[2:], tau * (np.asarray(r)[2:] - 0.5 * tau))
    w = np.asarray(losses.huber_weight(sq, tau))
    np.testing.assert_allclose(w, [1.0, 1.0, 0.5, 0.1])
    assert float(losses.tukey_weight(jnp.asarray(9.0), 2.0)) == 0.0
    np.testing.assert_allclose(
        float(losses.cauchy_weight(jnp.asarray(0.0), 1.5)), 1.0
    )


# ------------------------------- linalg -------------------------------


def test_small_solves():
    a2 = jnp.asarray(rng.standard_normal((40, 2, 2))) + 3.0 * jnp.eye(2)
    b2 = jnp.asarray(rng.standard_normal((40, 2)))
    x = linalg.solve2x2(a2, b2)
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", np.asarray(a2), np.asarray(x)), np.asarray(b2),
        atol=1e-9,
    )
    a3 = jnp.asarray(rng.standard_normal((40, 3, 3))) + 4.0 * jnp.eye(3)
    b3 = jnp.asarray(rng.standard_normal((40, 3)))
    x3 = linalg.solve3x3(a3, b3)
    np.testing.assert_allclose(
        np.einsum("nij,nj->ni", np.asarray(a3), np.asarray(x3)), np.asarray(b3),
        atol=1e-9,
    )


def test_bicubic_interpolation_properties():
    """Catmull-Rom bicubic: exact at integers, reproduces linear ramps,
    Jacobian matches AD (reference: image.h InterpolateBicubicVector)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from camera_calibration_tpu.ops import interp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (12, 10)))

    # interpolates the data: exact at pixel centers
    gx, gy = np.meshgrid(np.arange(2, 8), np.arange(2, 9))
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1).astype(float))
    vals = interp.bicubic(img, pts)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(img)[gy.ravel(), gx.ravel()], atol=1e-12
    )

    # linear precision: a ramp is reproduced exactly
    yy, xx = np.mgrid[0:12, 0:10]
    ramp = jnp.asarray(0.3 * xx + 0.2 * yy + 0.1)
    q = jnp.asarray(rng.uniform([1.0, 1.0], [7.9, 9.9], (50, 2)))
    v, g = interp.bicubic_with_jacobian(ramp, q)
    np.testing.assert_allclose(
        np.asarray(v), 0.3 * np.asarray(q)[:, 0] + 0.2 * np.asarray(q)[:, 1] + 0.1,
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(g[:, 0]), 0.3, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g[:, 1]), 0.2, atol=1e-10)

    # Jacobian == AD of the value fn on a generic image
    g_ad = jax.vmap(jax.jacfwd(lambda p: interp.bicubic(img, p)))(q)
    _, g_an = interp.bicubic_with_jacobian(img, q)
    np.testing.assert_allclose(np.asarray(g_an), np.asarray(g_ad), atol=1e-9)

    # multi-channel shape contract
    img3 = jnp.asarray(rng.uniform(0, 1, (12, 10, 3)))
    v3, g3 = interp.bicubic_with_jacobian(img3, q)
    assert v3.shape == (50, 3) and g3.shape == (50, 3, 2)
    # channel 0 of the multi-channel result matches the single-channel path
    v0, g0 = interp.bicubic_with_jacobian(img3[..., 0], q)
    np.testing.assert_allclose(np.asarray(v3[:, 0]), np.asarray(v0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g3[:, 0]), np.asarray(g0), atol=1e-12)
