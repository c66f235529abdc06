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
