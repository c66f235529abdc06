"""Serialization round-trip tests (reference analog: io_test.cc:87-361)."""

import numpy as np
import jax.numpy as jnp

import ba_harness
from camera_calibration_tpu.ba.dataset import (
    Dataset,
    Imageset,
    KnownGeometry,
    PointFeature,
)
from camera_calibration_tpu.io import dataset_bin, state_io
from camera_calibration_tpu.models import noncentral_generic as ncg
from camera_calibration_tpu.models import parametric as pm


def test_dataset_bin_roundtrip(tmp_path):
    ds = Dataset(
        num_cameras=2,
        image_sizes=[(640, 480), (800, 600)],
        imagesets=[
            Imageset(
                features=[
                    [PointFeature(xy=np.array([1.5, 2.5]), feature_id=3)],
                    [
                        PointFeature(xy=np.array([10.25, 20.75]), feature_id=7),
                        PointFeature(xy=np.array([30.0, 40.0]), feature_id=8),
                    ],
                ],
                filenames=["img_000.png"],
            ),
            Imageset(features=[[], []], filenames=[""]),
        ],
        known_geometries=[
            KnownGeometry(
                cell_length_in_meters=0.0254,
                feature_id_to_position={3: (0, 1), 7: (2, 3), 8: (3, 3)},
            )
        ],
    )
    path = tmp_path / "dataset.bin"
    dataset_bin.save_dataset(path, ds)
    ds2 = dataset_bin.load_dataset(path)
    assert ds2.num_cameras == 2
    assert ds2.image_sizes == [(640, 480), (800, 600)]
    assert len(ds2.imagesets) == 2
    f = ds2.imagesets[0].features[1][0]
    np.testing.assert_allclose(f.xy, [10.25, 20.75])
    assert f.feature_id == 7
    g = ds2.known_geometries[0]
    assert abs(g.cell_length_in_meters - 0.0254) < 1e-7
    assert g.feature_id_to_position[8] == (3, 3)


def test_ba_state_roundtrip(tmp_path):
    state_gt, obs, segments = ba_harness.make_problem(
        seed=1, n_points=20, n_poses=4
    )
    used = [True, True, False, True]
    fid_map = {i: i for i in range(20)}
    state_io.save_ba_state(tmp_path / "state", state_gt, used, fid_map)
    state2, used2, fid2 = state_io.load_ba_state(tmp_path / "state")
    assert used2 == used
    assert fid2 == fid_map
    for i, u in enumerate(used):
        if not u:
            continue
        np.testing.assert_allclose(
            np.asarray(state2.rig_t_global[i]),
            np.asarray(state_gt.rig_t_global[i]),
            atol=1e-12,
        )
        dot = abs(
            float(
                jnp.dot(state2.rig_q_global[i], state_gt.rig_q_global[i])
            )
        )
        assert abs(dot - 1) < 1e-12
    np.testing.assert_allclose(
        np.asarray(state2.points), np.asarray(state_gt.points), atol=1e-12
    )
    m1 = state_gt.intrinsics[0]
    m2 = state2.intrinsics[0]
    np.testing.assert_allclose(
        np.asarray(m2.grid), np.asarray(m1.grid), atol=1e-12
    )
    assert (m2.width, m2.height) == (m1.width, m1.height)


def test_parametric_and_noncentral_model_roundtrip(tmp_path):
    tpf = pm.CentralThinPrismFisheyeModel(
        params=jnp.asarray(np.linspace(1, 12, 12)),
        width=640, height=480, use_equidistant_projection=True,
    )
    p = tmp_path / "tpf.yaml"
    state_io.save_camera_model(tpf, p)
    tpf2 = state_io.load_camera_model(p)
    np.testing.assert_allclose(np.asarray(tpf2.params), np.asarray(tpf.params))
    assert tpf2.use_equidistant_projection

    rng = np.random.default_rng(0)
    dirs = rng.normal(0, 1, (5, 6, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    nc = ncg.NoncentralGenericModel(
        direction_grid=jnp.asarray(dirs),
        point_grid=jnp.asarray(rng.normal(0, 0.01, (5, 6, 3))),
        width=320, height=240,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=319, calibration_max_y=239,
    )
    p2 = tmp_path / "nc.yaml"
    state_io.save_camera_model(nc, p2)
    nc2 = state_io.load_camera_model(p2)
    np.testing.assert_allclose(
        np.asarray(nc2.direction_grid), np.asarray(nc.direction_grid),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(nc2.point_grid), np.asarray(nc.point_grid), atol=1e-12
    )


def _mini_dataset(fid0=0, xy0=1.0):
    return Dataset(
        num_cameras=1,
        image_sizes=[(640, 480)],
        imagesets=[
            Imageset(
                features=[[
                    PointFeature(xy=np.array([xy0, xy0 + 1]), feature_id=fid0),
                    PointFeature(xy=np.array([xy0 + 2, xy0 + 3]),
                                 feature_id=fid0 + 1),
                ]],
                filenames=["a.png"],
            )
        ],
        known_geometries=[
            KnownGeometry(
                cell_length_in_meters=0.01,
                feature_id_to_position={fid0: (0, 0), fid0 + 1: (1, 0)},
            )
        ],
    )


def test_dataset_merge_offsets_feature_ids(tmp_path):
    """Dataset.merge treats each file's pattern sheets as new known
    geometries with offset feature IDs (reference: dataset.cc:77-126)."""
    a = _mini_dataset(fid0=0, xy0=1.0)
    b = _mini_dataset(fid0=0, xy0=100.0)
    a.merge(b)
    assert len(a.imagesets) == 2
    assert len(a.known_geometries) == 2
    # b's IDs offset past a's max (1) -> offset 2
    merged_ids = sorted(
        f.feature_id for f in a.imagesets[1].features[0]
    )
    assert merged_ids == [2, 3]
    assert set(a.known_geometries[1].feature_id_to_position) == {2, 3}
    # positions preserved
    assert a.known_geometries[1].feature_id_to_position[2] == (0, 0)
    # no ID collisions overall
    all_ids = [
        f.feature_id for s in a.imagesets for fl in s.features for f in fl
    ]
    assert len(all_ids) == len(set(all_ids))

    # mismatched cameras / sizes refuse to merge (reference returns false)
    import pytest

    c = _mini_dataset()
    c.num_cameras = 2
    with pytest.raises(ValueError):
        a.merge(c)
    d = _mini_dataset()
    d.image_sizes = [(100, 100)]
    with pytest.raises(ValueError):
        a.merge(d)


def test_load_datasets_merges_files(tmp_path):
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    dataset_bin.save_dataset(pa, _mini_dataset(fid0=0))
    dataset_bin.save_dataset(pb, _mini_dataset(fid0=0, xy0=50.0))
    merged = dataset_bin.load_datasets(f"{pa},{pb}")
    assert len(merged.imagesets) == 2
    assert len(merged.known_geometries) == 2
    ids1 = {f.feature_id for f in merged.imagesets[1].features[0]}
    assert ids1 == {2, 3}
    # single path still works
    one = dataset_bin.load_datasets(str(pa))
    assert len(one.imagesets) == 1


def test_meshlab_project_round_trip(tmp_path):
    """MeshLab .mlp write/read (reference:
    libvis/external_io/meshlab_project.h:43-76)."""
    import numpy as np

    from camera_calibration_tpu.io import meshlab

    rng = np.random.default_rng(3)
    mat = np.eye(4)
    mat[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    mat[:3, 3] = [0.1, -0.2, 0.3]
    meshes = [
        meshlab.MeshLabMeshInfo("cloud_a", "a.obj", np.eye(4)),
        meshlab.MeshLabMeshInfo("cloud_b", "sub/b.ply", mat),
    ]
    p = tmp_path / "project.mlp"
    meshlab.write_meshlab_project(p, meshes)
    text = p.read_text()
    assert text.startswith("<!DOCTYPE MeshLabDocument>")
    back = meshlab.read_meshlab_project(p)
    assert [m.label for m in back] == ["cloud_a", "cloud_b"]
    assert back[1].filename == "sub/b.ply"
    np.testing.assert_allclose(back[1].global_tr_mesh, mat, atol=1e-12)

    # convenience exporter: relative filenames + pose transform
    cloud = tmp_path / "clouds" / "scene.obj"
    cloud.parent.mkdir()
    cloud.write_text("v 0 0 0\n")
    meshlab.export_stereo_project(
        tmp_path / "scene.mlp", [str(cloud)],
        poses=[(mat[:3, :3], mat[:3, 3])],
    )
    back = meshlab.read_meshlab_project(tmp_path / "scene.mlp")
    assert back[0].filename == "clouds/scene.obj"
    np.testing.assert_allclose(back[0].global_tr_mesh[:3, :3], mat[:3, :3])
