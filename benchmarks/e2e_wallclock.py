"""End-to-end wall-clock budget: detect -> dense init -> BA -> polish -> report.

Renders a standard ~20-view dataset (640x480, 12x12 star pattern) through
the REAL user pipeline and reports a per-phase timing table — the
framework's answer to the reference's per-stage scoped timers
(libvis/timing.h:47; detector stage timers
feature_detector_tagged_pattern.cc:222,291,349,1016).

Usage: python benchmarks/e2e_wallclock.py [n_views]
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N_VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
W, H = 640, 480

t_wall0 = time.perf_counter()
phases = []


def phase(name, t0):
    dt = time.perf_counter() - t0
    phases.append((name, dt))
    print(f"[phase] {name}: {dt:.2f} s", flush=True)
    return time.perf_counter()


tmp = tempfile.mkdtemp(prefix="e2e_bench_")
pat_dir = os.path.join(tmp, "pattern")
img_dir = os.path.join(tmp, "images")
out_dir = os.path.join(tmp, "out")

from camera_calibration_tpu import cli
from camera_calibration_tpu import config as _cctpu_config

_cctpu_config.configure_compilation_cache(entry_point=True)

t0 = time.perf_counter()
rc = cli.main([
    "create-pattern", "--output_directory", pat_dir,
    "--squares_x", "12", "--squares_y", "12",
    "--square_length_in_meters", "0.02",
])
assert rc == 0
pattern_yaml = os.path.join(pat_dir, "pattern_resolution_12x12_segments_16.yaml")
rc = cli.main([
    "render-synthetic", "--pattern_file", pattern_yaml,
    "--output_directory", img_dir,
    "--num_images", str(N_VIEWS), "--width", str(W), "--height", str(H),
    "--min_z", "0.35", "--max_z", "0.55",
    "--noise", "0.01", "--seed", "1",
])
assert rc == 0
t0 = phase("render (setup, not pipeline)", t0)

# ---- phase 1: feature detection (batch over the dataset) ----
import argparse

ds = cli._detect_dataset([img_dir], [pattern_yaml], argparse.Namespace(),
                         log=lambda *a: None)
n_feats = sum(len(s.features[0]) for s in ds.imagesets)
t0 = phase(f"detect ({len(ds.imagesets)} images, {n_feats} features)", t0)

# ---- phase 2: dense initialization ----
from camera_calibration_tpu.init.dense_init import (
    DenseInitializer, DenseInitOptions,
)

init = DenseInitializer(ds, 0, DenseInitOptions(seed=0))
res = init.run()
assert res is not None, "dense init failed"
t0 = phase(
    f"dense init ({sum(res.image_used)}/{len(ds.imagesets)} localized)", t0
)

# ---- phase 3: BA state fit at coarse resolution ----
from camera_calibration_tpu import calibrate as cal
from camera_calibration_tpu.init.state_init import build_ba_state

full_res = cal.compute_grid_resolution(W, H, 25)
coarse = cal.grid_resolution_for_level(2, *full_res)
state, data, fid_to_idx, image_used = build_ba_state(
    ds, [res], (max(4, coarse[1]), max(4, coarse[0])),
    dtype=np.float32,
)
t0 = phase("fit coarse model (build_ba_state)", t0)

# ---- phase 4: calibrate (pyramid + outliers + final), phase-timed ----
options = cal.CalibrateOptions(
    num_pyramid_levels=3,
    approx_pixels_per_cell=25,
    outlier_removal_factor=8.0,
    final_iterations=100,
    lm_steps_per_call=5,
    polish_iterations=0,
)
cal.prewarm_pyramid_executables(state, data, options)
for level in range(options.num_pyramid_levels - 1, 0, -1):
    state, _ = cal.run_ba(state, data, options.pyramid_iterations[0], 1e-4,
                          options)
    state, info2 = cal.run_ba(state, data, options.pyramid_iterations[1], 1.0,
                              options)
    rx, ry = cal.grid_resolution_for_level(level - 1, *full_res)
    new_intr = [cal.resample_central_generic(state.intrinsics[0], (rx, ry))]
    state = type(state)(
        rig_q_global=state.rig_q_global, rig_t_global=state.rig_t_global,
        cam_q_rig=state.cam_q_rig, cam_t_rig=state.cam_t_rig,
        points=state.points, intrinsics=tuple(new_intr),
    )
    t0 = phase(f"BA pyramid level {level} (+resample to {rx}x{ry})", t0)

state, _ = cal.run_ba(state, data, options.pyramid_iterations[0], 1e-4, options)
data, removed = cal.delete_outlier_features(state, data, 8.0)
t0 = phase(f"BA outlier pass (removed {removed})", t0)

state, info = cal.run_ba(state, data, options.final_iterations, 1e-4, options)
t0 = phase("final BA (100 iters @ 1e-4)", t0)

# ---- phase 5: f64 CPU polish ----
options_p = cal.CalibrateOptions(polish_iterations=10,
                                 lm_steps_per_call=5)
state, data, pinfo = cal.polish_float64(state, data, options_p)
t0 = phase("f64 CPU polish (10 iters)", t0)

# ---- phase 6: report ----
from camera_calibration_tpu.report.calibration_report import (
    create_calibration_report,
)

with cal.float64_cpu_scope():
    metrics = create_calibration_report(os.path.join(out_dir, "report"),
                                        state, data)
t0 = phase("calibration report", t0)

total = time.perf_counter() - t_wall0
med = metrics[0]["reprojection_error_median"]
print()
print("| Phase | seconds |")
print("|---|---|")
for name, dt in phases:
    print(f"| {name} | {dt:.2f} |")
print(f"| TOTAL (incl. setup) | {total:.2f} |")
print()
print(json.dumps({
    "metric": "e2e_wallclock_s",
    "value": round(sum(dt for n, dt in phases if "setup" not in n), 2),
    "unit": f"s ({N_VIEWS} views 640x480, detect->init->BA->polish->report)",
    "median_px": med,
}))
