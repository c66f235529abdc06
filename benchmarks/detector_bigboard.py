"""Large-board detector end-to-end timing: 50x72 squares, ~3.5k corners.

Renders the tagged star pattern under a mild homography at ~27 px/square
(1378x1950 image), runs the FULL detector (tag seeding -> homography
growth -> two-stage refinement -> validation) twice, and reports the warm
per-image wall clock and feature counts/accuracy.  The reference's
detector is real-time on a 2017 GPU for small boards (Readme.md:42); this
board is the largest pattern the reference ships (patterns/ 50x72).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import camera_calibration_tpu  # noqa: F401
from camera_calibration_tpu import config as _cctpu_config

_cctpu_config.configure_compilation_cache(entry_point=True)
from camera_calibration_tpu.features import detector as fdet
from camera_calibration_tpu.features import pattern as pat

n_x, n_y = 50, 72
square_px = 27.0
spec = pat.PatternSpec(
    num_star_segments=16,
    squares_x=n_x,
    squares_y=n_y,
    square_length_in_meters=0.01,
    tags=[pat.AprilTagInfo(x=22, y=34, width=4, height=4, index=0)],
)
angle, persp = 0.03, 1e-6
c, s = np.cos(angle), np.sin(angle)
h_pp = np.array(
    [
        [square_px * c, -square_px * s, 2.2 * square_px],
        [square_px * s, square_px * c, 2.0 * square_px],
        [persp, -persp, 1.0],
    ]
)
w = int(square_px * (n_x + 3))
h = int(square_px * (n_y + 3))
print(f"rendering {n_x}x{n_y} board at {w}x{h} ...")
img = pat.render_pattern(
    spec, np.linalg.inv(h_pp), (w, h), supersample=3,
    tag_renderer=pat.make_tag_renderer(spec),
)

gt = {}
for coord in spec.valid_feature_coords():
    q = h_pp @ np.array([coord[0], coord[1], 1.0])
    gt[coord] = q[:2] / q[2]
print(f"{len(gt)} ground-truth corners")

det = fdet.FeatureDetector([spec])
# min over repeats: the remote TPU runtime's dispatch latency varies by
# >2x between sessions and the detector is dispatch-bound, so a single
# warm measurement conflates detector cost with runtime weather
warm_times = []
for run in range(4):
    t0 = time.perf_counter()
    features, per_pattern = det.detect(img)
    dt = time.perf_counter() - t0
    errs = []
    for coord, d in per_pattern[0].items():
        # detections are pixel-center convention; gt is pixel-corner
        errs.append(np.linalg.norm(np.asarray(d.position) + 0.5 - gt[coord]))
    errs = np.array(errs)
    tag = "cold" if run == 0 else f"warm[{run}]"
    if run > 0:
        warm_times.append(dt)
    print(
        f"{tag}: {len(features)}/{len(gt)} features in {dt:.1f}s "
        f"({dt / max(len(features), 1) * 1e3:.2f} ms/feature), "
        f"median err {np.median(errs):.4f} px", flush=True,
    )
print(f"warm best of {len(warm_times)}: {min(warm_times):.1f}s "
      f"({min(warm_times) / max(len(features), 1) * 1e3:.2f} ms/feature)")

# --- cross-image batch: rings of all images share each device call ---
n_batch = 8
print(f"\nrendering {n_batch - 1} more views for the batch ...")
imgs, gts = [img], [gt]
for k in range(1, n_batch):
    a = 0.03 + 0.012 * k
    c, s = np.cos(a), np.sin(a)
    h_k = np.array(
        [
            [square_px * c, -square_px * s, (2.2 + 0.08 * k) * square_px],
            [square_px * s, square_px * c, (2.0 + 0.05 * k) * square_px],
            [persp, -persp, 1.0],
        ]
    )
    imgs.append(
        pat.render_pattern(
            spec, np.linalg.inv(h_k), (w, h), supersample=3,
            tag_renderer=pat.make_tag_renderer(spec),
        )
    )
    gk = {}
    for coord in spec.valid_feature_coords():
        q = h_k @ np.array([coord[0], coord[1], 1.0])
        gk[coord] = q[:2] / q[2]
    gts.append(gk)

det_b = fdet.FeatureDetector([spec])
batch_times = []
for run in range(3):
    t0 = time.perf_counter()
    results = det_b.detect_batch(imgs)
    dt = time.perf_counter() - t0
    n_feats = sum(len(r[0]) for r in results)
    errs = []
    for (feats, dets), gk in zip(results, gts):
        for coord, d in dets[0].items():
            errs.append(np.linalg.norm(np.asarray(d.position) + 0.5 - gk[coord]))
    errs = np.array(errs)
    tag = "batch cold" if run == 0 else f"batch warm[{run}]"
    if run > 0:
        batch_times.append(dt)
    print(
        f"{tag}: {n_feats}/{n_batch * len(gt)} features over {n_batch} "
        f"images in {dt:.1f}s ({dt / n_batch:.2f} s/image, "
        f"{dt / max(n_feats, 1) * 1e3:.2f} ms/feature), "
        f"median err {np.median(errs):.4f} px"
    )
print(f"batch warm best of {len(batch_times)}: {min(batch_times):.1f}s "
      f"({min(batch_times) / n_batch:.2f} s/image, "
      f"{min(batch_times) / max(n_feats, 1) * 1e3:.2f} ms/feature)")
