"""Parametric model tests: round trips and dense fitting.

(reference analogs: central_thin_prism_fisheye_test.cc:308-383,
central_opencv_test.cc:46-62, central_radial_test.cc:324-341)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from camera_calibration_tpu.models import parametric as pm


def _tpf_model(equidistant=True, w=640, h=480):
    params = jnp.asarray(
        [
            0.65 * w, 0.65 * w, 0.5 * w, 0.5 * h,
            0.23, -0.66, 0.64, -0.2,  # k1..k4 (ETH3D-like magnitudes)
            1.21e-4, -2.7e-5,  # p1 p2
            3.5e-5, -8.7e-5,  # sx1 sy1
        ],
        jnp.float64,
    )
    return pm.CentralThinPrismFisheyeModel(
        params=params, width=w, height=h, use_equidistant_projection=equidistant
    )


def _opencv_model(w=640, h=480):
    params = jnp.asarray(
        [
            0.65 * w, 0.65 * w, 0.5 * w, 0.5 * h,
            0.4, 0.04, -0.01, 0.6, 0.1, -0.02,  # k1..k6
            1.5e-4, -1.1e-4,  # p1 p2
        ],
        jnp.float64,
    )
    return pm.CentralOpenCVModel(params=params, width=w, height=h)


def _radial_model(w=640, h=480, k=30):
    params = np.zeros(8 + k)
    params[:8] = [0.65 * w, 0.65 * w, 0.5 * w, 0.5 * h, 1e-4, -8e-5, 4e-5, -6e-5]
    # smooth synthetic radial profile
    t = np.linspace(0, 1, k)
    params[8:] = 0.12 * t * t - 0.05 * t
    return pm.CentralRadialModel(params=jnp.asarray(params), width=w, height=h)


@pytest.mark.parametrize(
    "model",
    [_tpf_model(True), _tpf_model(False), _opencv_model(), _radial_model()],
    ids=["tpf_equidistant", "tpf_plain", "opencv", "radial"],
)
def test_project_unproject_roundtrip(model):
    rng = np.random.default_rng(11)
    px = jnp.asarray(
        rng.uniform(
            [0.15 * model.width, 0.15 * model.height],
            [0.85 * model.width, 0.85 * model.height],
            (400, 2),
        )
    )
    dirs, valid = pm.unproject(model, px, max_iterations=30)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-12
    )
    reproj, _, pvalid = pm.project_points(model, dirs)
    assert bool(jnp.all(pvalid))
    err = np.abs(np.asarray(reproj) - np.asarray(px)).max()
    assert err < 1e-6, err


@pytest.mark.parametrize(
    "template",
    [_tpf_model(True), _tpf_model(False), _opencv_model()],
    ids=["tpf_equidistant", "tpf_plain", "opencv"],
)
def test_fit_to_dense(template):
    # GT dense direction image from the template model itself.
    w, h = 160, 120
    gt = pm.replace(
        template,
        params=template.params.at[0].mul(w / template.width)
        .at[1].mul(w / template.width)
        .at[2].set(0.5 * w)
        .at[3].set(0.5 * h),
    )
    gt = pm.replace(gt, width=w, height=h) if hasattr(gt, "width") else gt
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2))
    dirs, valid = pm.unproject(gt, px, max_iterations=40)
    dense = np.asarray(dirs).reshape(h, w, 3)
    vmask = np.asarray(valid).reshape(h, w)

    fitted = pm.fit_parametric_to_dense(
        pm.replace(gt, params=jnp.zeros_like(gt.params)), dense, vmask,
        max_iterations=60,
    )
    # Compare via reprojection of the GT directions.
    sel = np.asarray(px)[::37]
    d_sel = jnp.asarray(dense.reshape(-1, 3)[::37])
    pred, _, pvalid = pm.project_points(fitted, d_sel)
    m = np.asarray(pvalid)
    err = np.linalg.norm(np.asarray(pred)[m] - sel[m], axis=-1)
    assert np.median(err) < 0.05, np.median(err)


def test_fit_strong_fisheye_linear_init():
    """The stacked linear distortion init must land strong-fisheye fits in
    the right basin (reference parametric.cc:234-242; zero-distortion
    starts stall on such fields)."""
    w, h = 640, 480
    gt = pm.CentralThinPrismFisheyeModel(
        params=jnp.asarray(
            [240.0, 242.0, 320.0, 240.0, -0.18, 0.045, -0.006, 0.0004,
             2e-3, -1.5e-3, 8e-4, -6e-4]
        ),
        width=w, height=h, use_equidistant_projection=True,
    )
    # sample at the quarter-raster pixel centers (full-res coord 4v+2)
    yy, xx = np.meshgrid(np.arange(h // 4) * 4 + 2.0,
                         np.arange(w // 4) * 4 + 2.0, indexing="ij")
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2))
    dirs, valid = pm.unproject(gt, px, max_iterations=60)
    dense = np.asarray(dirs).reshape(h // 4, w // 4, 3)
    vmask = np.asarray(valid).reshape(h // 4, w // 4)

    # fit in the subsampled raster; focal scales by 1/4
    fitted = pm.fit_parametric_to_dense(
        pm.CentralThinPrismFisheyeModel(
            params=jnp.zeros(12), width=w // 4, height=h // 4,
            use_equidistant_projection=True,
        ),
        dense, vmask, max_iterations=80,
    )
    sel = np.asarray(px)[::29] / 4.0
    d_sel = jnp.asarray(np.asarray(dirs)[::29])
    pred, _, pvalid = pm.project_points(fitted, d_sel)
    m = np.asarray(pvalid)
    err = np.linalg.norm(np.asarray(pred)[m] - sel[m], axis=-1)
    assert np.median(err) < 0.02, np.median(err)


def test_fit_parametric_rotation_coestimation():
    """(reference: parametric_r_dense, parametric.cc:427-462)"""
    from camera_calibration_tpu.ops import se3

    w, h = 320, 240
    gt = pm.CentralThinPrismFisheyeModel(
        params=jnp.asarray(
            [260.0, 258.0, 160.0, 120.0, -0.05, 0.01, 0.0, 0.0,
             1e-3, -1e-3, 0.0, 0.0]
        ),
        width=w, height=h, use_equidistant_projection=True,
    )
    yy, xx = np.meshgrid(np.arange(h // 2) * 2 + 1.0,
                         np.arange(w // 2) * 2 + 1.0, indexing="ij")
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2))
    dirs, valid = pm.unproject(gt, px, max_iterations=60)
    # tilt components can be absorbed by distortion/principal point; the
    # roll (z) component cannot — co-estimation must recover it
    w_gt = jnp.asarray([0.0, 0.0, 0.04])
    q_gt = se3.quat_exp(w_gt)
    # the stored dense field is R^{-1} d (so co-estimating R recovers q_gt)
    dirs_rot = se3.quat_rotate(se3.quat_conj(q_gt), dirs)
    dense = np.asarray(dirs_rot).reshape(h // 2, w // 2, 3)
    vmask = np.asarray(valid).reshape(h // 2, w // 2)

    fitted, q_est = pm.fit_parametric_to_dense(
        pm.CentralThinPrismFisheyeModel(
            params=jnp.zeros(12), width=w // 2, height=h // 2,
            use_equidistant_projection=True,
        ),
        dense, vmask, max_iterations=80, co_estimate_rotation=True,
    )
    # the roll component must be recovered (tilts may trade against
    # distortion — the physically meaningful invariant is the fit itself)
    q_est = np.asarray(q_est)
    roll_est = 2 * np.arctan2(q_est[3], q_est[0])
    assert abs(roll_est - 0.04) < 2e-3, (q_est, roll_est)
    # and the composed (rotation, model) reproduces the field
    d_sel = jnp.asarray(np.asarray(dirs_rot)[::37])
    pred, _, pvalid = pm.project_points(
        fitted, se3.quat_rotate(jnp.asarray(q_est), d_sel)
    )
    m = np.asarray(pvalid)
    sel = np.asarray(px)[::37] / 2.0
    err = np.linalg.norm(np.asarray(pred)[m] - sel[m], axis=-1)
    assert np.median(err) < 0.02, np.median(err)


def test_fit_and_report(tmp_path):
    """Fitting report on a generic model (reference: fitting_report.h:56)
    — fits must be in consistent full-resolution pixel units."""
    from camera_calibration_tpu.models import central_generic as cg
    from camera_calibration_tpu.report.fitting_report import fit_and_report

    # generic grid model from a pinhole-like field
    w, h, gres = 128, 96, 7
    fx = fy = 0.9 * w
    yy, xx = np.meshgrid(np.arange(gres), np.arange(gres), indexing="ij")
    px_g = (xx - 1.0) / (gres - 3.0) * w
    py_g = (yy - 1.0) / (gres - 3.0) * h
    dirs = np.stack(
        [(px_g - w / 2) / fx, (py_g - h / 2) / fy, np.ones_like(px_g)], -1
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    model = cg.CentralGenericModel(
        grid=jnp.asarray(dirs), width=w, height=h,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=w - 1, calibration_max_y=h - 1,
    )
    out = fit_and_report(
        model, str(tmp_path), model_names=("central_opencv",), subsample=2,
        log=lambda *a: None,
    )
    assert out["central_opencv"]["fitting_error_median_px"] < 0.05, out
    assert (tmp_path / "fitting_central_opencv_info.txt").exists()
