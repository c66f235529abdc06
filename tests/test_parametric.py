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
