"""Live-capture frame rate: the `record` surface's per-frame budget.

Measures what the operator experiences in `record` live mode
(ui/live_capture.LiveImageConsumer): frames/s of live detection on a
VGA stream, plus the per-frame latency split (detect vs bookkeeping).
The reference detects live on a 2017 GPU (reference Readme.md:42,
188-189); this is the TPU framework's equivalent number.

Method: render N synthetic VGA views of a 12x12 star pattern, then
stream them through the real consumer via a dir: ImageInput.  Warm-up
frame excluded (first detection compiles the refinement programs).
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import camera_calibration_tpu  # noqa: F401
from camera_calibration_tpu import config as _cctpu_config

_cctpu_config.configure_compilation_cache(entry_point=True)

from camera_calibration_tpu import cli

N_FRAMES = 24
W, H = 640, 480


def main():
    tmp = tempfile.mkdtemp(prefix="live_fps_")
    pat_dir = os.path.join(tmp, "pat")
    img_dir = os.path.join(tmp, "images")
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
        "--num_images", str(N_FRAMES), "--width", str(W), "--height", str(H),
        "--min_z", "0.35", "--max_z", "0.55", "--noise", "0.01",
        "--seed", "7",
    ])
    assert rc == 0

    from camera_calibration_tpu.ba.dataset import Dataset, KnownGeometry
    from camera_calibration_tpu.features import detector as fdet
    from camera_calibration_tpu.features import pattern as pat
    from camera_calibration_tpu.io.image_input import create_image_input
    from camera_calibration_tpu.ui.live_capture import (
        LiveCaptureOptions,
        LiveImageConsumer,
    )

    spec = pat.load_pattern_yaml(pattern_yaml)
    det = fdet.FeatureDetector([spec])
    dataset = Dataset(num_cameras=1, image_sizes=[])
    dataset.known_geometries.append(
        KnownGeometry(
            cell_length_in_meters=spec.square_length_in_meters,
            feature_id_to_position=dict(det.corner_maps[0]),
        )
    )
    consumer = LiveImageConsumer(
        dataset, det,
        LiveCaptureOptions(visualization_directory=None),
        log=lambda *a: None,
    )

    frame_times = []
    n_feats = []
    with create_image_input(f"dir:{img_dir}") as image_input:
        for i, images in enumerate(image_input):
            t0 = time.perf_counter()
            consumer.new_imageset(images)
            dt = time.perf_counter() - t0
            if i > 0:  # frame 0 pays one-time compiles
                frame_times.append(dt)
                n_feats.append(len(dataset.imagesets[-1].features[0])
                               if dataset.imagesets else 0)

    ft = np.asarray(frame_times)
    print(json.dumps({
        "metric": "live_detection_fps",
        "value": round(1.0 / float(np.median(ft)), 2),
        "unit": f"frames/s ({W}x{H}, median of {ft.size} frames)",
        "frame_ms_median": round(float(np.median(ft)) * 1000.0, 1),
        "frame_ms_p90": round(float(np.percentile(ft, 90)) * 1000.0, 1),
        "features_per_frame_median": float(np.median(n_feats)),
        "first_frame_s": None,  # excluded warm-up
    }))


if __name__ == "__main__":
    main()
