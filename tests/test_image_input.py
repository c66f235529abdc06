"""Image input backends + live capture + calibration visualizer.

(reference analogs: image_input/image_input.h:70 CreateForInputs,
ui/live_image_consumer.cc:66-150 NewImageset,
ui/calibration_window.h:54-64 per-stage update API)
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import test_detector as tdet
from camera_calibration_tpu.io.image_input import (
    DirectoryInput,
    create_image_input,
)


def _write_frames(tmp_path, name, frames):
    import cv2

    d = tmp_path / name
    d.mkdir()
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"img{i:03d}.png"), f)
    return str(d)


def _pattern_frames(n=2):
    spec, img, h_pp = tdet._make_pattern_image(seed=0)
    u8 = (img * 255).astype(np.uint8)
    return spec, [u8] * n, h_pp


def test_directory_input_and_factory(tmp_path):
    rng = np.random.default_rng(0)
    frames0 = [rng.integers(0, 255, (24, 32, 3), np.uint8) for _ in range(3)]
    frames1 = [rng.integers(0, 255, (24, 32, 3), np.uint8) for _ in range(4)]
    d0 = _write_frames(tmp_path, "cam0", frames0)
    d1 = _write_frames(tmp_path, "cam1", frames1)

    inp = create_image_input(f"dir:{d0},{d1}")
    assert isinstance(inp, DirectoryInput)
    assert inp.num_cameras == 2
    sets = list(inp)
    # synchronized: truncated to the shorter camera stream
    assert len(sets) == 3
    assert sets[0][0].shape == (24, 32, 3)
    np.testing.assert_array_equal(sets[1][1], frames1[1])


def test_video_capture_input(tmp_path):
    """The cv2.VideoCapture path (the v4l2 backend uses the same class,
    just with a device index instead of a file)."""
    import cv2

    path = str(tmp_path / "seq.avi")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48)
    )
    assert w.isOpened()
    rng = np.random.default_rng(1)
    frames = [
        (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8) for _ in range(5)
    ]
    for f in frames:
        w.write(f)
    w.release()

    with create_image_input(f"video:{path}") as inp:
        sets = list(inp)
    assert len(sets) == 5
    assert sets[0][0].shape == (48, 64, 3)


def test_capture_input_rejects_missing_source(tmp_path):
    with pytest.raises(RuntimeError):
        create_image_input(f"video:{tmp_path}/does_not_exist.avi")


def test_live_capture_consumer(tmp_path):
    """Frames with the rendered pattern produce detections, a growing
    dataset, recorded images, and a coverage map; blank frames are
    dropped (reference: live_image_consumer.cc:95-98)."""
    from camera_calibration_tpu.ba.dataset import Dataset
    from camera_calibration_tpu.features import detector as fdet
    from camera_calibration_tpu.ui.live_capture import (
        LiveCaptureOptions,
        LiveImageConsumer,
        run_live_capture,
    )

    spec, frames, _ = _pattern_frames(n=2)
    blank = np.full_like(frames[0], 255)
    d0 = _write_frames(tmp_path, "cam0", frames + [blank])

    det = fdet.FeatureDetector([spec])
    dataset = Dataset(num_cameras=1, image_sizes=[])
    options = LiveCaptureOptions(
        record_images=True,
        visualization_directory=str(tmp_path / "viz"),
    )
    consumer = LiveImageConsumer(
        dataset, det, options,
        record_directories=[str(tmp_path / "rec0")],
        log=lambda *a: None,
    )
    with create_image_input(f"dir:{d0}") as inp:
        kept = run_live_capture(inp, consumer)

    assert kept == 2  # blank imageset dropped
    assert len(dataset.imagesets) == 2
    n_feat = len(dataset.imagesets[0].features[0])
    assert n_feat > 30
    assert consumer.num_recorded == 2
    assert len(os.listdir(tmp_path / "rec0")) == 2
    assert os.path.exists(tmp_path / "viz" / "coverage_camera0.png")
    cov = consumer.detections_per_pixel[0]
    assert cov is not None and cov.max() >= 1


def test_record_cli_end_to_end(tmp_path):
    """`record` subcommand: dir inputs -> detection -> dataset.bin."""
    from camera_calibration_tpu.features import pattern as pat
    from camera_calibration_tpu.io import dataset_bin

    spec, frames, _ = _pattern_frames(n=2)
    d0 = _write_frames(tmp_path, "cam0", frames)
    pat_yaml = str(tmp_path / "pattern.yaml")
    pat.save_pattern_yaml(spec, pat_yaml)
    out = str(tmp_path / "out")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "camera_calibration_tpu.cli", "record",
            "--inputs", f"dir:{d0}",
            "--pattern_files", pat_yaml,
            "--output_directory", out,
            "--max_imagesets", "2",
        ],
        # load-proof: a fresh subprocess recompiles the whole detector
        # stack on XLA:CPU — 15 s in isolation but minutes when sharing
        # the box with 4 xdist workers and the on-chip kernel test
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    ds = dataset_bin.load_dataset(os.path.join(out, "dataset.bin"))
    assert len(ds.imagesets) == 2
    assert len(ds.imagesets[0].features[0]) > 30
    assert os.path.exists(os.path.join(out, "coverage_camera0.png"))


def test_calibration_visualizer_hooks(tmp_path):
    """Every per-stage hook writes its PNG (CalibrationWindow analog)."""
    import ba_harness
    from camera_calibration_tpu.ba.dataset import split_by_camera
    from camera_calibration_tpu.ui.calibration_visualizer import (
        CalibrationVisualizer,
    )

    state, obs, segments = ba_harness.make_problem(
        seed=5, n_points=24, n_poses=6
    )
    data = split_by_camera(obs, segments)
    vis = CalibrationVisualizer(str(tmp_path), min_update_seconds=0.0)

    vis.update_feature_detection(
        0, np.zeros((24, 32)), []
    )
    dirs = np.zeros((8, 8, 3))
    dirs[..., 2] = 1.0
    vis.update_initialization(0, dirs, np.ones((8, 8), bool))
    vis.update_observation_directions(0, state.intrinsics[0])
    vis.update_reprojection_errors(state, data, iteration=0)
    vis.update_error_histogram(state, data)
    vis.update_error_directions(state, data)
    vis.update_removed_outliers(state, data, removed_count=0)

    for name in (
        "feature_detection_camera0",
        "initialization_camera0",
        "observation_directions_camera0",
        "reprojection_errors_camera0",
        "error_histogram_camera0",
        "error_directions_camera0",
        "removed_outliers_camera0",
    ):
        assert os.path.exists(tmp_path / f"{name}.png"), name


def test_calibrate_with_visualizer(tmp_path):
    """calibrate() drives the visualizer per iteration and per stage."""
    import test_dense_init as tdi
    from camera_calibration_tpu import calibrate as cal
    from camera_calibration_tpu.init.dense_init import (
        DenseInitializer,
        DenseInitOptions,
    )
    from camera_calibration_tpu.init.state_init import build_ba_state
    from camera_calibration_tpu.ui.calibration_visualizer import (
        CalibrationVisualizer,
    )

    ds, cam, gt_poses = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=8, k=10, w=320, h=240
    )
    init = DenseInitializer(
        ds, 0,
        DenseInitOptions(max_initialization_attempts=100, seed=3,
                         min_matched_area_accept=0.15),
    )
    result = init.run()
    assert result is not None
    state, data, fid_to_idx, image_used = build_ba_state(
        ds, [result], (6, 6)
    )
    vis = CalibrationVisualizer(str(tmp_path), min_update_seconds=0.0)
    options = cal.CalibrateOptions(
        num_pyramid_levels=1, approx_pixels_per_cell=40,
        outlier_removal_factor=8.0, final_iterations=6,
    )
    state, data, report = cal.calibrate(
        state, data, options,
        known_geometries=ds.known_geometries,
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
        visualizer=vis,
    )
    for name in (
        "reprojection_errors_camera0",
        "removed_outliers_camera0",
        "error_histogram_camera0",
        "error_directions_camera0",
        "observation_directions_camera0",
    ):
        assert os.path.exists(tmp_path / f"{name}.png"), name


def test_pattern_display_render_geometry():
    """PatternDisplay renders the whole pattern centered on the screen
    (reference ui/pattern_display.cc); the interactive window itself is
    display-dependent, but the rendered image and availability probe are
    not."""
    from camera_calibration_tpu.features import pattern as pat
    from camera_calibration_tpu.ui.pattern_display import PatternDisplay

    spec = pat.PatternSpec(
        num_star_segments=16, squares_x=8, squares_y=8,
        square_length_in_meters=0.02,
        tags=[pat.AprilTagInfo(x=3, y=3, width=2, height=2, index=0)],
    )
    disp = PatternDisplay(spec, screen_size=(640, 480), supersample=2)
    img = disp.image
    assert img.shape == (480, 640)
    # pattern drawn: both black and white regions present, margins white
    assert img.min() < 0.2 and img.max() > 0.8
    assert img[:4].mean() > 0.95 and img[-4:].mean() > 0.95
    # availability probe must not raise in a headless environment
    assert isinstance(PatternDisplay.available(), bool)
