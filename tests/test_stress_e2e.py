"""Stress E2E: full CLI pipeline under harsh imaging conditions.

Renders pattern views with vignetting, defocus, JPEG artifacts, exposure
drift, and sensor noise (the degradations real captures suffer that the
plain renders don't), then runs the complete user pipeline — detector ->
dense init -> pyramid BA -> mixed-precision polish -> report — and
asserts the reference's quality gate still holds
(reprojection_error_median "significantly smaller than 0.1 px",
reference Readme.md:458-459; detector-bias test discipline:
test/feature_detection_test.cc:48).
"""

import os

from camera_calibration_tpu import cli


def test_full_pipeline_harsh_conditions(tmp_path):
    pat_dir = str(tmp_path / "pattern")
    img_dir = str(tmp_path / "images")
    out_dir = str(tmp_path / "out")

    rc = cli.main([
        "create-pattern", "--output_directory", pat_dir,
        "--squares_x", "12", "--squares_y", "12",
        "--square_length_in_meters", "0.02",
    ])
    assert rc == 0
    pattern_yaml = os.path.join(
        pat_dir, "pattern_resolution_12x12_segments_16.yaml"
    )

    rc = cli.main([
        "render-synthetic", "--pattern_file", pattern_yaml,
        "--output_directory", img_dir,
        "--num_images", "6", "--width", "640", "--height", "480",
        "--min_z", "0.35", "--max_z", "0.5",
        "--noise", "0.015", "--vignetting", "0.3",
        "--defocus_sigma", "0.8", "--jpeg_quality", "80",
        "--exposure_drift", "0.2", "--seed", "1",
    ])
    assert rc == 0

    captured = {}
    real_print = print

    def spy_print(*a, **kw):
        if a and isinstance(a[0], str) and a[0] == "[calibrate] report:":
            captured.update(a[1])
        real_print(*a, **kw)

    import builtins

    old = builtins.print
    builtins.print = spy_print
    try:
        rc = cli.main([
            "calibrate",
            "--image_directories", img_dir,
            "--pattern_files", pattern_yaml,
            "--output_directory", out_dir,
            "--dtype", "mixed", "--polish_iterations", "3",
            "--num_pyramid_levels", "1", "--final_iterations", "15",
            "--approx_pixels_per_cell", "40",
        ])
    finally:
        builtins.print = old
    assert rc == 0
    med = captured.get("reprojection_error_median")
    assert med is not None, captured
    # the 0.1 px gate must survive the degradation stack
    assert med < 0.05, captured
    assert abs(captured["scale_factor"] - 1.0) < 0.01, captured
    # the state directory is complete for downstream tools
    assert os.path.exists(os.path.join(out_dir, "state", "intrinsics0.yaml"))
