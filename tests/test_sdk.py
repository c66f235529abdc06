"""NumPy consumer SDK vs the JAX models (reference analog:
generic_models/src/main.cc self-tests)."""

import numpy as np
import jax.numpy as jnp

import ba_harness
from camera_calibration_tpu import sdk
from camera_calibration_tpu.io import state_io
from camera_calibration_tpu.models import central_generic as cg


def test_sdk_matches_jax_model(tmp_path):
    _, model = ba_harness.make_gt_model()
    p = tmp_path / "intrinsics0.yaml"
    state_io.save_camera_model(model, p)
    cam = sdk.load_camera(p)

    rng = np.random.default_rng(0)
    px = rng.uniform([2, 2], [model.width - 2, model.height - 2], (200, 2))

    d_sdk = cam.unproject(px)
    d_jax, _ = cg.unproject(model, jnp.asarray(px))
    np.testing.assert_allclose(d_sdk, np.asarray(d_jax), atol=1e-9)

    d_j, jac = cam.unproject_with_jacobian(px[:5])
    eps = 1e-6
    for k in range(2):
        dp = px[:5].copy()
        dp[:, k] += eps
        dm = px[:5].copy()
        dm[:, k] -= eps
        fd = (cam.unproject(dp) - cam.unproject(dm)) / (2 * eps)
        np.testing.assert_allclose(jac[:, :, k], fd, atol=1e-5)

    # project ∘ unproject round trip
    pts = d_sdk * rng.uniform(0.5, 3.0, (200, 1))
    reproj, valid = cam.project(pts)
    assert valid.all()
    np.testing.assert_allclose(reproj, px, atol=1e-4)
