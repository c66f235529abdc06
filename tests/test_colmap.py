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


def test_refine_colmap_tool(tmp_path):
    """COLMAP-model BA refinement round trip
    (reference: tools/bundle_adjustment.cc:50,190)."""
    import ba_harness
    from camera_calibration_tpu import cli
    from camera_calibration_tpu.ops import se3
    import jax.numpy as jnp

    # build a COLMAP model from a perturbed synthetic parametric problem
    state_gt, obs, segments = ba_harness.make_problem(
        seed=10, n_points=40, n_poses=6, model_kind="tpf"
    )
    state0 = ba_harness.perturb_state(state_gt, seed=11, knot_sigma=0.0)
    # images with per-observation tracks
    imgs = []
    n = obs.imageset.shape[0]
    pts2d_per_img = {i: [] for i in range(6)}
    for k in range(n):
        si = int(obs.imageset[k])
        pts2d_per_img[si].append(
            (float(obs.pixel[k, 0]), float(obs.pixel[k, 1]),
             int(obs.point[k]) + 1)
        )
    for si in range(6):
        q, t = se3.se3_compose(
            state0.cam_q_rig[0], state0.cam_t_rig[0],
            state0.rig_q_global[si], state0.rig_t_global[si],
        )
        imgs.append(colmap.ColmapImage(
            image_id=si + 1, q=np.asarray(q), t=np.asarray(t),
            camera_id=1, name=f"im{si}.png",
            points2d=pts2d_per_img[si],
        ))
    pts3d = {
        i + 1: (np.asarray(state0.points[i]), np.array([0, 0, 0]), 0.0, [])
        for i in range(40)
    }
    model = colmap.ColmapModel(
        cameras={1: state_gt.intrinsics[0]}, images=imgs, points3d=pts3d
    )
    colmap.write_model(tmp_path / "in", model)

    rc = cli.main([
        "refine-colmap", "--colmap_model", str(tmp_path / "in"),
        "--output_directory", str(tmp_path / "out"),
        "--iterations", "25", "--freeze", "intrinsics",
    ])
    assert rc == 0
    refined = colmap.read_model(tmp_path / "out")
    # poses+points must have re-converged: compare reprojection errors
    from camera_calibration_tpu.models import parametric as pm
    errs = []
    for im in refined.images:
        q = jnp.asarray(im.q)
        t = jnp.asarray(im.t)
        for (x, y, pid) in im.points2d:
            xyz = jnp.asarray(refined.points3d[pid][0])
            from camera_calibration_tpu.ops import se3 as s3
            xc = s3.quat_rotate(q, xyz) + t
            px, _, v = pm.project_points(refined.cameras[1], xc[None])
            if bool(v[0]):
                errs.append(np.hypot(float(px[0, 0]) - x, float(px[0, 1]) - y))
    assert np.median(errs) < 1e-3, np.median(errs)


def test_visualize_calibration_kalibr(tmp_path):
    """(reference: tools/visualize_calibration.cc Kalibr input)"""
    from camera_calibration_tpu import cli

    yml = tmp_path / "camchain.yaml"
    yml.write_text(
        "cam0:\n"
        "  camera_model: pinhole\n"
        "  intrinsics: [460.0, 458.0, 320.0, 240.0]\n"
        "  distortion_model: radtan\n"
        "  distortion_coeffs: [-0.28, 0.07, 0.0002, 0.00002]\n"
        "  resolution: [640, 480]\n"
        "cam1:\n"
        "  camera_model: pinhole\n"
        "  intrinsics: [230.0, 229.0, 160.0, 120.0]\n"
        "  distortion_model: equidistant\n"
        "  distortion_coeffs: [0.01, -0.002, 0.0, 0.0]\n"
        "  resolution: [320, 240]\n"
    )
    rc = cli.main([
        "visualize-calibration", "--kalibr_yaml", str(yml),
        "--output_directory", str(tmp_path / "viz"),
    ])
    assert rc == 0
    assert (tmp_path / "viz" / "kalibr_camera0_directions.png").exists()
    assert (tmp_path / "viz" / "kalibr_camera1_directions.png").exists()
    assert (tmp_path / "viz" / "kalibr_camera0_distortion.png").exists()
