"""Golden-file interop fixtures for the reference's artifact formats.

The golden bytes/text below are hand-authored directly from the
reference's serialization code — NOT produced by this repo's writers —
so a drift in either the reader or the writer fails here instead of
breaking interop with the reference tool silently.

- dataset.bin: applications/camera_calibration/src/camera_calibration/
  io/calibration_io.cc:52-150 (``calib_data`` magic, u32 version 0,
  u32 num_cameras + per-camera u32 width/height, u32 num_imagesets each
  with a u32-length filename and per-camera feature lists of
  (f32 x, f32 y, i32 id), u32 num_known_geometries each with f32 cell
  length and (i32 id, i32 x, i32 y) entries; little-endian).
- intrinsicsX.yaml: calibration_io.cc:526-642 (plain ``key : value``
  lines, grid row-major top-to-bottom, x,y,z per knot, setprecision(14)).
"""

import struct

import numpy as np

from camera_calibration_tpu.io import dataset_bin, state_io


def _golden_dataset_bytes():
    """Hand-built per calibration_io.cc:52-150: 2 cameras, 2 imagesets,
    1 known geometry (entries in sorted-id order)."""
    b = b"calib_data"
    b += struct.pack("<I", 0)            # version
    b += struct.pack("<I", 2)            # num_cameras
    b += struct.pack("<II", 640, 480)    # camera 0 size
    b += struct.pack("<II", 800, 600)    # camera 1 size
    b += struct.pack("<I", 2)            # num_imagesets
    # imageset 0: filename "img_000.png"
    name = b"img_000.png"
    b += struct.pack("<I", len(name)) + name
    #   camera 0: 1 feature
    b += struct.pack("<I", 1)
    b += struct.pack("<ffi", 1.5, 2.5, 3)
    #   camera 1: 2 features
    b += struct.pack("<I", 2)
    b += struct.pack("<ffi", 10.25, 20.75, 7)
    b += struct.pack("<ffi", 30.0, 40.0, 8)
    # imageset 1: empty filename, no features
    b += struct.pack("<I", 0)
    b += struct.pack("<I", 0)            # camera 0: 0 features
    b += struct.pack("<I", 0)            # camera 1: 0 features
    # known geometries
    b += struct.pack("<I", 1)
    b += struct.pack("<f", 0.0254)       # cell length (f32)
    b += struct.pack("<I", 3)
    b += struct.pack("<iii", 3, 0, 1)
    b += struct.pack("<iii", 7, 2, 3)
    b += struct.pack("<iii", 8, 3, 3)
    return b


def test_dataset_bin_reads_golden(tmp_path):
    """Our reader parses bytes written exactly per the reference spec."""
    p = tmp_path / "golden.bin"
    p.write_bytes(_golden_dataset_bytes())
    ds = dataset_bin.load_dataset(p)
    assert ds.num_cameras == 2
    assert ds.image_sizes == [(640, 480), (800, 600)]
    assert len(ds.imagesets) == 2
    assert ds.imagesets[0].filenames[0] == "img_000.png"
    f = ds.imagesets[0].features[1][1]
    np.testing.assert_allclose(f.xy, [30.0, 40.0])
    assert f.feature_id == 8
    assert ds.imagesets[1].features == [[], []]
    g = ds.known_geometries[0]
    assert abs(g.cell_length_in_meters - np.float32(0.0254)) < 1e-9
    assert g.feature_id_to_position == {3: (0, 1), 7: (2, 3), 8: (3, 3)}


def test_dataset_bin_writes_golden_bytes(tmp_path):
    """Our writer reproduces the golden bytes exactly (geometry entries
    sorted by id — one of the valid orders of the reference's
    unordered_map, chosen for reproducibility)."""
    p = tmp_path / "golden.bin"
    p.write_bytes(_golden_dataset_bytes())
    ds = dataset_bin.load_dataset(p)
    q = tmp_path / "rewritten.bin"
    dataset_bin.save_dataset(q, ds)
    assert q.read_bytes() == _golden_dataset_bytes()


_GOLDEN_TPF_YAML = """type : CentralThinPrismFisheyeModel
width : 640
height : 480
use_equidistant_projection : true
parameters : [340.5, 341.25, 319.5, 239.5, 0.01, -0.002, 0.0003, -4e-05, 0.001, -0.001, 0.0005, -0.0005]
"""


def test_camera_yaml_reads_golden_parametric(tmp_path):
    """Hand-authored intrinsicsX.yaml per calibration_io.cc:605-626."""
    p = tmp_path / "intrinsics0.yaml"
    p.write_text(_GOLDEN_TPF_YAML)
    m = state_io.load_camera_model(p)
    assert m.width == 640 and m.height == 480
    assert bool(m.use_equidistant_projection)
    np.testing.assert_allclose(
        np.asarray(m.params),
        [340.5, 341.25, 319.5, 239.5, 0.01, -0.002, 0.0003, -4e-05,
         0.001, -0.001, 0.0005, -0.0005],
    )


def test_camera_yaml_writes_golden_parametric(tmp_path):
    p = tmp_path / "intrinsics0.yaml"
    p.write_text(_GOLDEN_TPF_YAML)
    m = state_io.load_camera_model(p)
    q = tmp_path / "rewritten.yaml"
    state_io.save_camera_model(m, q)
    assert q.read_text() == _GOLDEN_TPF_YAML


def _golden_grid_yaml():
    """CentralGenericModel YAML per calibration_io.cc:546-565: a 4x4
    grid of unit directions (z-dominant), 14-significant-digit floats."""
    dirs = []
    for gy in range(4):
        for gx in range(4):
            v = np.array([0.05 * (gx - 1.5), 0.04 * (gy - 1.5), 1.0])
            v = v / np.linalg.norm(v)
            dirs += [v[0], v[1], v[2]]
    grid_str = ", ".join("%.14g" % x for x in dirs)
    text = (
        "type : CentralGenericModel\n"
        "width : 64\n"
        "height : 48\n"
        "calibration_min_x : 0\n"
        "calibration_min_y : 0\n"
        "calibration_max_x : 63\n"
        "calibration_max_y : 47\n"
        "grid_width : 4\n"
        "grid_height : 4\n"
        "# The grid is stored in row-major order, top to bottom. "
        "Each row is stored left to right. "
        "Each grid point is stored as x, y, z.\n"
        "grid : [" + grid_str + "]\n"
    )
    return text, np.asarray(dirs).reshape(4, 4, 3)


def test_camera_yaml_grid_golden_roundtrip(tmp_path):
    text, grid = _golden_grid_yaml()
    p = tmp_path / "intrinsics0.yaml"
    p.write_text(text)
    m = state_io.load_camera_model(p)
    assert m.width == 64 and m.calibration_max_y == 47
    np.testing.assert_allclose(np.asarray(m.grid), grid, atol=1e-13)
    q = tmp_path / "rewritten.yaml"
    state_io.save_camera_model(m, q)
    assert q.read_text() == text
