"""Full end-to-end test: synthetic features -> dense init -> calibrate.

The framework-level analog of the reference's full Calibrate() flow on a
synthetic dataset (BASELINE config: "Central generic spline-grid model,
single camera full BA").
"""

import numpy as np

import test_dense_init as tdi
from camera_calibration_tpu import calibrate as cal
from camera_calibration_tpu.init.dense_init import DenseInitializer, DenseInitOptions
from camera_calibration_tpu.init.state_init import build_ba_state


def test_e2e_mono_central_generic():
    ds, cam, gt_poses = tdi._make_synthetic_dataset(
        seed=2, n_imagesets=10, k=12, w=320, h=240
    )
    init = DenseInitializer(
        ds,
        0,
        DenseInitOptions(
            max_initialization_attempts=100, seed=3,
            min_matched_area_accept=0.15,
        ),
    )
    result = init.run()
    assert result is not None
    assert sum(result.image_used) >= 8

    state, data, fid_to_idx, image_used = build_ba_state(ds, [result], (6, 6))

    options = cal.CalibrateOptions(
        num_pyramid_levels=2,
        approx_pixels_per_cell=40,
        outlier_removal_factor=8.0,
        final_iterations=30,
        pyramid_iterations=(8, 25),
    )
    state, data, report = cal.calibrate(
        state,
        data,
        options,
        known_geometries=ds.known_geometries,
        feature_id_to_point_index=fid_to_idx,
        log=lambda *a: None,
    )
    # Exact synthetic observations: expect far below the 0.1 px gate
    # (reference Readme.md:458-459).
    assert report["reprojection_error_median"] < 0.02, report
    # Metric scale: points were seeded at their true metric positions, so
    # the recovered scale factor should stay close to 1.
    assert abs(report["scale_factor"] - 1.0) < 0.05, report["scale_factor"]
