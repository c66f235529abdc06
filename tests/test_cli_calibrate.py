"""CLI-level E2E tests: solver surface, mixed precision, dataset merge.

The user surface the reference exposes through main.cc flags
(--schur_mode Readme.md:330-352, multi-file --dataset_files merged via
Dataset::Merge dataset.cc:77-126, CUDA-then-CPU-polish precision flow
calibration.cc:1127-1133), exercised through this framework's CLI.
"""

import numpy as np
import pytest

import test_dense_init as tdi
from camera_calibration_tpu import cli
from camera_calibration_tpu.init.dense_init import (
    DenseInitializer,
    DenseInitOptions,
)
from camera_calibration_tpu.init.state_init import build_ba_state
from camera_calibration_tpu.io import dataset_bin, state_io


@pytest.fixture(scope="module")
def synth_cli_setup(tmp_path_factory):
    """One synthetic dataset + a saved coarse init state, shared by the
    solver-mode runs (which resume via --state_directory so the dense
    init cost is paid once)."""
    root = tmp_path_factory.mktemp("cli_calib")
    ds, cam, gt_poses = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=10, k=12, w=320, h=240
    )
    ds_path = root / "dataset.bin"
    dataset_bin.save_dataset(ds_path, ds)

    init = DenseInitializer(
        ds, 0,
        DenseInitOptions(max_initialization_attempts=100, seed=3,
                         min_matched_area_accept=0.15),
    )
    res = init.run()
    assert res is not None
    state, data, fid_to_idx, image_used = build_ba_state(ds, [res], (6, 6))
    state_dir = root / "state0"
    state_io.save_ba_state(state_dir, state, image_used, fid_to_idx)
    return str(ds_path), str(state_dir)


def _median_err(out_dir, ds_path):
    """Reprojection median of a saved state against the dataset."""
    import jax.numpy as jnp

    from camera_calibration_tpu import calibrate as cal
    from camera_calibration_tpu.ba.dataset import ObservationTable

    state, used, fid_map = state_io.load_ba_state(f"{out_dir}/state")
    ds = dataset_bin.load_datasets(ds_path)
    ims, ptids, pixels = [], [], []
    for i, s in enumerate(ds.imagesets):
        if i < len(used) and not used[i]:
            continue
        for f in s.features[0]:
            if f.feature_id in fid_map:
                ims.append(i)
                ptids.append(fid_map[f.feature_id])
                pixels.append(np.asarray(f.xy, np.float64))
    data = (
        ObservationTable(
            imageset=jnp.asarray(np.array(ims, np.int32)),
            camera=jnp.zeros(len(ims), jnp.int32),
            point=jnp.asarray(np.array(ptids, np.int32)),
            pixel=jnp.asarray(np.stack(pixels)),
            valid=jnp.ones(len(ims), bool),
        ),
    )
    errs = cal.observation_reprojection_errors(state, data)
    e = np.asarray(errs[0])
    return float(np.median(e[np.isfinite(e)]))


@pytest.mark.parametrize(
    "solver",
    ["schur", "schur_poses", "schur_direct", "schur_direct_points", "pcg"],
)
def test_cli_solver_modes(synth_cli_setup, tmp_path, solver):
    """Every reference SchurMode analog is reachable from the CLI and
    converges (reference: --schur_mode, Readme.md:330-352)."""
    ds_path, state_dir = synth_cli_setup
    out = tmp_path / f"out_{solver}"
    rc = cli.main([
        "calibrate",
        "--dataset_files", ds_path,
        "--state_directory", state_dir,
        "--output_directory", str(out),
        "--dtype", "float32",
        "--final_iterations", "25",
        "--outlier_removal_factor", "0",
        "--solver", solver,
    ])
    assert rc == 0
    assert _median_err(out, ds_path) < 0.05


def test_cli_solver_levers(synth_cli_setup, tmp_path):
    """block_chunk / cg_warm_start / proj_iterations thread from the CLI
    through CalibrateOptions to BAOptions."""
    ds_path, state_dir = synth_cli_setup
    out = tmp_path / "out_levers"
    rc = cli.main([
        "calibrate",
        "--dataset_files", ds_path,
        "--state_directory", state_dir,
        "--output_directory", str(out),
        "--dtype", "float32",
        "--final_iterations", "24",
        "--outlier_removal_factor", "0",
        "--lm_steps_per_call", "4",
        "--cg_warm_start",
        "--proj_iterations", "6",
        "--block_chunk", "256",
    ])
    assert rc == 0
    assert _median_err(out, ds_path) < 0.05


def test_cli_mixed_precision_default(synth_cli_setup, tmp_path):
    """The default --dtype mixed runs the f32 pipeline then f64 CPU
    polish (reference: calibration.cc:1127-1133)."""
    ds_path, state_dir = synth_cli_setup
    out = tmp_path / "out_mixed"
    rc = cli.main([
        "calibrate",
        "--dataset_files", ds_path,
        "--state_directory", state_dir,
        "--output_directory", str(out),
        "--final_iterations", "25",
        "--outlier_removal_factor", "0",
        "--polish_iterations", "4",
    ])
    assert rc == 0
    assert _median_err(out, ds_path) < 0.05


def test_cli_multi_dataset_merge(tmp_path):
    """--dataset_files with two files calibrates the merged recordings
    jointly (reference: Dataset::Merge, dataset.cc:77-126): two rendered
    recordings of physically distinct pattern sheets, one camera."""
    ds_a, cam, _ = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=6, k=12, w=320, h=240
    )
    ds_b, _, _ = tdi._make_synthetic_dataset(
        seed=9, n_imagesets=6, k=12, w=320, h=240
    )
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    dataset_bin.save_dataset(pa, ds_a)
    dataset_bin.save_dataset(pb, ds_b)
    out = tmp_path / "out_merged"
    rc = cli.main([
        "calibrate",
        "--dataset_files", f"{pa},{pb}",
        "--output_directory", str(out),
        "--dtype", "float32",
        "--num_pyramid_levels", "1",
        "--final_iterations", "24",
        "--outlier_removal_factor", "0",
    ])
    assert rc == 0
    med = _median_err(str(out), f"{pa},{pb}")
    assert med < 0.05, med


def test_cli_compare_reconstructions(tmp_path, capsys):
    """CompareReconstructions parity (reference:
    tools/bundle_adjustment.cc:223-396): GT state vs a scaled + slightly
    perturbed copy must recover the scale, report small aligned pose
    errors, a ~0 intrinsics rotation, and write the aligned .mlp."""
    import ba_harness
    from camera_calibration_tpu.ba.state import scale_state

    state_a, _, _ = ba_harness.make_problem(seed=5, n_points=20, n_poses=6)
    used = [True] * 6
    fid_map = {i: i for i in range(20)}

    # state_b: metric scale x2 plus small pose-translation noise
    rng = np.random.default_rng(0)
    state_b = scale_state(state_a, 2.0)
    state_b = type(state_b)(
        rig_q_global=state_b.rig_q_global,
        rig_t_global=state_b.rig_t_global
        + rng.normal(0, 1e-4, state_b.rig_t_global.shape),
        cam_q_rig=state_b.cam_q_rig,
        cam_t_rig=state_b.cam_t_rig,
        points=state_b.points,
        intrinsics=state_b.intrinsics,
    )

    dir_a = tmp_path / "rec_a" / "state"
    dir_b = tmp_path / "rec_b" / "state"
    state_io.save_ba_state(dir_a, state_a, used, fid_map)
    state_io.save_ba_state(dir_b, state_b, used, fid_map)

    rc = cli.main(["compare-reconstructions", str(dir_a), str(dir_b)])
    assert rc == 0
    out = capsys.readouterr().out
    scale = float(out.split("umeyama scale (state_a -> state_b):")[1]
                  .split()[0])
    assert abs(scale - 2.0) < 1e-2, out
    med_center = float(out.split("median")[1].split()[0])
    assert med_center < 1e-2, out
    rot = float(out.split("intrinsics rotation between calibrations:")[1]
                .split()[0])
    assert rot < 0.5, out
    rel = float(out.split("relative endpoint difference:")[1]
                .split("%")[0])
    assert abs(rel) < 1.0, out
    assert (tmp_path / "reconstructions_aligned_at_start.mlp").exists()

    # mismatched pose counts must be rejected (reference CHECK_EQ)
    state_c, _, _ = ba_harness.make_problem(seed=5, n_points=20, n_poses=4)
    dir_c = tmp_path / "rec_c" / "state"
    state_io.save_ba_state(dir_c, state_c, [True] * 4, fid_map)
    assert cli.main(
        ["compare-reconstructions", str(dir_a), str(dir_c)]
    ) == 1


def test_cli_dense_init_cache(tmp_path, capsys):
    """--dense_initialization_base_path round trip (reference:
    calibration.cc:948-974): the first run computes and saves the dense
    initialization, the second loads it and skips the init phase."""
    ds, cam, gt_poses = tdi._make_synthetic_dataset(
        seed=11, n_imagesets=10, k=12, w=320, h=240
    )
    ds_path = tmp_path / "dataset.bin"
    dataset_bin.save_dataset(ds_path, ds)
    cache = tmp_path / "dense_init"
    common = [
        "calibrate",
        "--dataset_files", str(ds_path),
        "--dtype", "float32",
        "--num_pyramid_levels", "1",
        "--final_iterations", "20",
        "--outlier_removal_factor", "0",
        "--seed", "3",
        "--dense_initialization_base_path", str(cache),
    ]
    rc = cli.main(common + ["--output_directory", str(tmp_path / "o1")])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "saved dense initialization" in out1
    assert (tmp_path / "dense_init.npz").exists()

    rc = cli.main(common + ["--output_directory", str(tmp_path / "o2")])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "loaded dense initialization" in out2
    assert _median_err(str(tmp_path / "o2"), str(ds_path)) < 0.05


def test_cli_resume_resample_finer(synth_cli_setup, tmp_path):
    """--state_directory resume with an EXPLICIT --model resamples the
    loaded 6x6 grid to the requested resolution before optimizing
    (reference: ResampleModelsIfNecessary, calibration.cc:571-612)."""
    ds_path, state_dir = synth_cli_setup
    out = tmp_path / "out_resample"
    rc = cli.main([
        "calibrate",
        "--dataset_files", ds_path,
        "--state_directory", state_dir,
        "--output_directory", str(out),
        "--model", "central_generic",
        "--num_pyramid_levels", "1",
        "--approx_pixels_per_cell", "30",
        "--dtype", "float32",
        "--final_iterations", "25",
        "--outlier_removal_factor", "0",
    ])
    assert rc == 0
    state, _, _ = state_io.load_ba_state(out / "state")
    from camera_calibration_tpu import calibrate as cal

    m = state.intrinsics[0]
    full = cal.compute_grid_resolution(
        m.calibration_max_x + 1 - m.calibration_min_x,
        m.calibration_max_y + 1 - m.calibration_min_y, 30,
    )
    assert m.grid.shape[:2] == (max(4, full[1]), max(4, full[0]))
    assert m.grid.shape[:2] != (6, 6)
    assert _median_err(str(out), ds_path) < 0.05


def test_cli_resume_convert_to_parametric(synth_cli_setup, tmp_path):
    """Resume-time model TYPE conversion: load a central-generic state,
    request --model central_opencv — the loaded model is converted via a
    dense-direction fit and BA continues on the parametric model
    (reference: ResampleModel general arm, calibration.cc:424-525)."""
    ds_path, state_dir = synth_cli_setup
    out = tmp_path / "out_convert"
    rc = cli.main([
        "calibrate",
        "--dataset_files", ds_path,
        "--state_directory", state_dir,
        "--output_directory", str(out),
        "--model", "central_opencv",
        "--num_pyramid_levels", "1",
        "--dtype", "float32",
        "--final_iterations", "30",
        "--outlier_removal_factor", "0",
    ])
    assert rc == 0
    state, _, _ = state_io.load_ba_state(out / "state")
    from camera_calibration_tpu.models import parametric as pm

    assert isinstance(state.intrinsics[0], pm.CentralOpenCVModel)
    assert _median_err(str(out), ds_path) < 0.1
