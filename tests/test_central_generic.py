"""CentralGeneric model tests: fit to pinhole GT, project/unproject round trip.

Mirrors the reference test strategy (reference: applications/
camera_calibration/src/camera_calibration/test/central_generic_test.cc:52-56
and test/util.h:42-105): a pinhole camera defines ground-truth directions;
the fitted grid model must reproduce them and satisfy project∘unproject≈id.
"""

import jax
import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import pinhole
from camera_calibration_tpu.models.fit import fit_central_generic_to_dense


def _fitted_model(grid_res=8, w=64, h=48):
    cam = pinhole.make_pinhole(
        fx=0.9 * w, fy=0.9 * w, cx=0.5 * w, cy=0.5 * h, width=w, height=h
    )
    dense = pinhole.direction_image(cam)
    valid = np.ones((h, w), bool)
    model = fit_central_generic_to_dense(
        np.asarray(dense), valid, (grid_res, grid_res), max_iterations=15
    )
    return cam, model


def test_fit_reproduces_pinhole_unprojection():
    cam, model = _fitted_model()
    rng = np.random.default_rng(3)
    px = jnp.asarray(
        rng.uniform([1.0, 1.0], [cam.width - 1.0, cam.height - 1.0], (500, 2))
    )
    gt = pinhole.unproject(cam, px)
    est, valid = cg.unproject(model, px)
    assert bool(jnp.all(valid))
    err = np.linalg.norm(np.asarray(est) - np.asarray(gt), axis=-1)
    assert err.max() < 1e-4, err.max()


def test_project_unproject_roundtrip():
    cam, model = _fitted_model()
    rng = np.random.default_rng(4)
    px = jnp.asarray(
        rng.uniform([2.0, 2.0], [cam.width - 2.0, cam.height - 2.0], (300, 2))
    )
    dirs, _ = cg.unproject(model, px)
    # cold start (no warm start): must still converge
    reproj, g, valid = cg.project_directions(model, dirs, max_iterations=80)
    assert bool(jnp.all(valid))
    err = np.abs(np.asarray(reproj) - np.asarray(px)).max()
    assert err < 1e-4, err

    # warm start converges fast
    reproj2, _, valid2 = cg.project_directions(
        model, dirs, init_xy=px + 0.5, max_iterations=10
    )
    assert bool(jnp.all(valid2))
    assert np.abs(np.asarray(reproj2) - np.asarray(px)).max() < 1e-4


def test_unproject_jacobian_matches_ad():
    _, model = _fitted_model()
    xy = jnp.asarray([23.4, 17.8])
    d, jac = cg.unproject_with_jacobian(model, xy)
    jac_ad = jax.jacfwd(
        lambda p: cg.unproject_grid_coords(model, cg.pixel_to_grid(model, p))
    )(xy)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad), atol=1e-9)


def test_projection_sensitivities_match_ad():
    """Implicit-function-theorem projection derivatives vs finite differences."""
    _, model = _fitted_model()
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform([5.0, 5.0], [55.0, 40.0], (20, 2)))
    dirs, _ = cg.unproject(model, px)
    _, g, valid = cg.project_directions(model, dirs, init_xy=px, max_iterations=30)
    assert bool(jnp.all(valid))
    sens = cg.projection_sensitivities(model, g)

    # FD check of d pixel / d dir for a few points. Perturbations are taken
    # in the tangent plane of d0 (renormalized), so both sides compare
    # P·(I − d dᵀ).
    eps = 1e-4
    for i in range(5):
        d0 = np.asarray(dirs[i])
        tangent_proj = np.eye(3) - np.outer(d0, d0)
        jac_fd = np.zeros((2, 3))
        for k in range(3):
            step = tangent_proj[:, k] * eps
            dp = d0 + step
            dp /= np.linalg.norm(dp)
            dm = d0 - step
            dm /= np.linalg.norm(dm)
            ppx, _, v = cg.project_directions(
                model, jnp.asarray(dp[None]), init_xy=px[i : i + 1],
                max_iterations=100, eps=1e-22,
            )
            pmx, _, v2 = cg.project_directions(
                model, jnp.asarray(dm[None]), init_xy=px[i : i + 1],
                max_iterations=100, eps=1e-22,
            )
            assert bool(v[0]) and bool(v2[0])
            jac_fd[:, k] = np.asarray((ppx[0] - pmx[0]) / (2 * eps))
        p_analytic = np.asarray(sens["pix_wrt_dir"][i]) @ tangent_proj
        np.testing.assert_allclose(p_analytic, jac_fd, rtol=2e-3, atol=1e-3)


def test_projection_knot_sensitivities_match_fd():
    _, model = _fitted_model()
    px = jnp.asarray([[30.0, 25.0]])
    dirs, _ = cg.unproject(model, px)
    _, g, valid = cg.project_directions(model, dirs, init_xy=px, max_iterations=30)
    assert bool(valid[0])
    sens = cg.projection_sensitivities(model, g)
    bx, by = int(sens["base_xy"][0, 0]), int(sens["base_xy"][0, 1])
    w = np.asarray(sens["weights"][0])
    pn = np.asarray(sens["pn"][0])

    eps = 1e-4
    grid0 = np.asarray(model.grid)

    def proj_with(grid_np):
        mp = cg.CentralGenericModel(
            grid=jnp.asarray(grid_np), width=model.width, height=model.height,
            calibration_min_x=model.calibration_min_x,
            calibration_min_y=model.calibration_min_y,
            calibration_max_x=model.calibration_max_x,
            calibration_max_y=model.calibration_max_y,
        )
        ppx, _, v = cg.project_directions(
            mp, dirs, init_xy=px, max_iterations=100, eps=1e-22
        )
        assert bool(v[0])
        return np.asarray(ppx[0])

    for (iy, ix) in [(1, 1), (2, 2), (0, 3)]:
        for k in range(3):
            gp = grid0.copy()
            gp[by + iy, bx + ix, k] += eps
            gm = grid0.copy()
            gm[by + iy, bx + ix, k] -= eps
            fd = (proj_with(gp) - proj_with(gm)) / (2 * eps)
            analytic = -w[iy, ix] * pn[:, k]
            np.testing.assert_allclose(analytic, fd, rtol=5e-3, atol=1e-4)
