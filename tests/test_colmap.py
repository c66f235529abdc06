"""COLMAP text-model IO round trip (reference analog: external_io tests)."""

import numpy as np
import jax.numpy as jnp

from camera_calibration_tpu.io import colmap
from camera_calibration_tpu.models import parametric as pm
from camera_calibration_tpu.models import pinhole as ph


def test_colmap_roundtrip(tmp_path):
    cams = {
        1: ph.make_pinhole(500.0, 510.0, 320.0, 240.0, 640, 480),
        2: pm.CentralOpenCVModel(
            params=jnp.asarray(
                [400.0, 405.0, 320.0, 240.0, 0.1, -0.05, 0.01, 0.2, 0.0,
                 0.0, 1e-4, -2e-4]
            ),
            width=640, height=480,
        ),
        3: pm.CentralThinPrismFisheyeModel(
            params=jnp.asarray(
                [350.0, 355.0, 320.0, 240.0, 0.2, -0.1, 0.05, -0.01,
                 1e-4, 2e-4, 3e-5, -4e-5]
            ),
            width=640, height=480, use_equidistant_projection=True,
        ),
    }
    images = [
        colmap.ColmapImage(
            image_id=1,
            q=np.array([0.9, 0.1, 0.2, np.sqrt(1 - 0.81 - 0.01 - 0.04)]),
            t=np.array([0.5, -0.2, 1.0]),
            camera_id=1,
            name="img0.png",
            points2d=[(10.5, 20.5, 1), (30.0, 40.0, 2)],
        )
    ]
    points3d = {
        1: (np.array([0.1, 0.2, 0.3]), np.array([255, 0, 0]), 0.5, [(1, 0)]),
        2: (np.array([-0.1, 0.0, 0.4]), np.array([0, 255, 0]), 0.2, [(1, 1)]),
    }
    model = colmap.ColmapModel(cameras=cams, images=images, points3d=points3d)
    colmap.write_model(tmp_path / "colmap", model)
    m2 = colmap.read_model(tmp_path / "colmap")

    assert isinstance(m2.cameras[1], ph.PinholeCamera)
    assert float(m2.cameras[1].fx) == 500.0
    assert isinstance(m2.cameras[2], pm.CentralOpenCVModel)
    np.testing.assert_allclose(
        np.asarray(m2.cameras[2].params), np.asarray(cams[2].params),
        atol=1e-10,
    )
    assert isinstance(m2.cameras[3], pm.CentralThinPrismFisheyeModel)
    np.testing.assert_allclose(
        np.asarray(m2.cameras[3].params), np.asarray(cams[3].params),
        atol=1e-10,
    )
    im = m2.images[0]
    np.testing.assert_allclose(im.q, images[0].q, atol=1e-10)
    np.testing.assert_allclose(im.t, images[0].t, atol=1e-10)
    assert im.name == "img0.png"
    assert im.points2d[1] == (30.0, 40.0, 2)
    np.testing.assert_allclose(m2.points3d[2][0], points3d[2][0], atol=1e-10)
    # COLMAP's THIN_PRISM_FISHEYE is inherently equidistant — the round trip
    # must preserve the flag...
    assert m2.cameras[3].use_equidistant_projection
    # ...and exporting a non-equidistant TPF model must refuse rather than
    # silently change projection semantics.
    import pytest

    bad = pm.CentralThinPrismFisheyeModel(
        params=cams[3].params, width=640, height=480,
        use_equidistant_projection=False,
    )
    with pytest.raises(TypeError):
        colmap._camera_to_colmap(bad)


def test_export_ba_state(tmp_path):
    import ba_harness

    state_gt, obs, segments = ba_harness.make_problem(
        seed=4, n_points=20, n_poses=3, model_kind="tpf"
    )
    colmap.export_ba_state(
        tmp_path / "model", state_gt, None, [True, True, True],
        {i: i for i in range(20)},
    )
    m = colmap.read_model(tmp_path / "model")
    assert len(m.images) == 3
    assert len(m.points3d) == 20
    assert isinstance(m.cameras[1], pm.CentralThinPrismFisheyeModel)
