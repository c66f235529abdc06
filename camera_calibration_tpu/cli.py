"""Command-line interface.

The role of the reference's main.cc CLI (reference: applications/
camera_calibration/src/camera_calibration/main.cc:70-427): feature
extraction from image directories, full calibration from datasets, and
side tools, with reference-compatible flag names where sensible.  The
live-capture Qt GUI is out of scope (headless TPU framework).

Subcommands:
  calibrate         full pipeline: [detect] -> dense init -> pyramid BA
  extract-features  detector only: images -> dataset.bin
  report            calibration report for a saved state
  create-pattern    generate a star pattern (PNG + YAML)
  compare           reprojection comparison of two saved states
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from contextlib import nullcontext as _nullcontext


def _load_gray(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _detect_dataset(image_dirs, pattern_files, options, log=print,
                    visualizer=None):
    """Run the feature detector over image directories -> Dataset."""
    import numpy as np

    from camera_calibration_tpu.ba.dataset import Dataset, Imageset, KnownGeometry
    from camera_calibration_tpu.features import detector as fdet
    from camera_calibration_tpu.features import pattern as pat

    patterns = [pat.load_pattern_yaml(p) for p in pattern_files]
    det = fdet.FeatureDetector(patterns)
    corner_maps = det.corner_maps

    per_cam_files = []
    for d in image_dirs:
        files = sorted(
            f
            for f in glob.glob(os.path.join(d, "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".pgm", ".tif"))
        )
        per_cam_files.append(files)
    n_sets = min(len(f) for f in per_cam_files)
    n_cameras = len(image_dirs)

    # batch each camera's images: growth rings of all images share the
    # device calls (features.detector.detect_batch)
    image_sizes = []
    per_cam_features = []
    for ci in range(n_cameras):
        imgs = [_load_gray(per_cam_files[ci][si]) for si in range(n_sets)]
        image_sizes.append((imgs[0].shape[1], imgs[0].shape[0]))
        results = det.detect_batch(imgs)
        feats = []
        for si, (features, _) in enumerate(results):
            log(
                f"[detect] camera {ci} image {si}: {len(features)} features"
                f" ({os.path.basename(per_cam_files[ci][si])})"
            )
            if visualizer is not None:
                visualizer.update_feature_detection(ci, imgs[si], features)
            feats.append(features)
        per_cam_features.append(feats)
    imagesets = [
        Imageset(
            features=[per_cam_features[ci][si] for ci in range(n_cameras)],
            filenames=[
                os.path.basename(per_cam_files[ci][si])
                for ci in range(n_cameras)
            ],
        )
        for si in range(n_sets)
    ]

    geoms = []
    for pi, spec in enumerate(patterns):
        geoms.append(
            KnownGeometry(
                cell_length_in_meters=spec.square_length_in_meters,
                feature_id_to_position={
                    fid: coord for fid, coord in corner_maps[pi].items()
                },
            )
        )
    return Dataset(
        num_cameras=n_cameras,
        image_sizes=image_sizes,
        imagesets=imagesets,
        known_geometries=geoms,
    )


def cmd_calibrate(args):
    import jax

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        # On TPU machines the accelerator runtime fatally rejects 64-bit
        # layouts; the f64 path is the CPU-class path, so pin all work to
        # the CPU backend (mirrors calibrate.polish_float64).
        try:
            jax.config.update(
                "jax_default_device", jax.devices("cpu")[0]
            )
        except RuntimeError:
            pass
    import jax.numpy as jnp
    import numpy as np

    from camera_calibration_tpu import calibrate as cal
    from camera_calibration_tpu.init.dense_init import (
        DenseInitializer,
        DenseInitOptions,
    )
    from camera_calibration_tpu.init.state_init import build_ba_state
    from camera_calibration_tpu.io import dataset_bin, state_io

    # "mixed" (the default) = float32 pipeline on the accelerator
    # followed by float64 CPU polish iterations (calibrate.polish_float64,
    # reference: calibration.cc:1127-1133).
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    polish_iterations = (
        args.polish_iterations if args.dtype == "mixed" else 0
    )

    visualizer = None
    if getattr(args, "live_directory", None):
        from camera_calibration_tpu.ui.calibration_visualizer import (
            CalibrationVisualizer,
        )

        visualizer = CalibrationVisualizer(args.live_directory)

    # 1. dataset
    if args.dataset_files:
        # comma-separated files merge into one joint-calibration dataset
        # (reference: Dataset::Merge, dataset.cc:77-126)
        dataset = dataset_bin.load_datasets(args.dataset_files)
        n_merged = len(args.dataset_files.split(","))
        if n_merged > 1:
            print(
                f"[dataset] merged {n_merged} files: "
                f"{len(dataset.imagesets)} imagesets, "
                f"{len(dataset.known_geometries)} known geometries"
            )
    else:
        if not (args.image_directories and args.pattern_files):
            print("need --dataset_files or --image_directories + --pattern_files")
            return 1
        dataset = _detect_dataset(
            args.image_directories.split(","),
            args.pattern_files.split(","),
            args,
            visualizer=visualizer,
        )
        os.makedirs(args.output_directory, exist_ok=True)
        dataset_bin.save_dataset(
            os.path.join(args.output_directory, "dataset.bin"), dataset
        )

    os.makedirs(args.output_directory, exist_ok=True)

    # 2. initial state: resume from a saved state directory, or dense init
    if args.state_directory:
        from camera_calibration_tpu.init.state_init import (
            feature_id_to_point_index as fid_map_fn,
        )

        state, used, fid_to_idx = state_io.load_ba_state(
            args.state_directory, dtype=dtype
        )
        if not fid_to_idx:
            fid_to_idx = fid_map_fn(dataset)
        # rebuild per-camera observation tables for the used imagesets
        from camera_calibration_tpu.ba.dataset import build_per_camera_tables

        data = build_per_camera_tables(
            dataset, fid_to_idx, image_used=used, dtype=dtype
        )
        print(f"[resume] loaded state from {args.state_directory}")
        # Resume-time model resampling / type conversion (reference:
        # ResampleModelsIfNecessary, calibration.cc:571-612, invoked on
        # resume at :999): when the user EXPLICITLY requests a model
        # kind, the loaded state is resampled to the coarsest level of
        # the requested pyramid (and converted across model types if
        # needed), then the full pyramid runs.  Without an explicit
        # --model, resume continues at the loaded resolution —
        # a crash-resume must not restart the pyramid.
        n_pyramid_resume = 1
        if args.model is not None and not args.localize_only:
            state2 = cal.resample_models_if_necessary(
                state, args.model, args.approx_pixels_per_cell,
                args.num_pyramid_levels - 1,
            )
            if state2 is not state:
                state = state2
                n_pyramid_resume = args.num_pyramid_levels
        options = cal.CalibrateOptions(
            num_pyramid_levels=n_pyramid_resume,
            approx_pixels_per_cell=args.approx_pixels_per_cell,
            outlier_removal_factor=args.outlier_removal_factor,
            final_iterations=args.final_iterations,
            freeze=("points", "intrinsics") if args.localize_only else (),
            lm_steps_per_call=args.lm_steps_per_call,
            solver=args.solver,
            block_chunk=args.block_chunk,
            cg_warm_start=args.cg_warm_start,
            proj_iterations=args.proj_iterations,
            polish_iterations=polish_iterations,
        )
        if len(used) < state.rig_q_global.shape[0]:
            used = list(used) + [True] * (
                state.rig_q_global.shape[0] - len(used)
            )
        state, data, rep = cal.calibrate(
            state, data, options,
            known_geometries=dataset.known_geometries,
            feature_id_to_point_index=fid_to_idx,
            state_output_path=os.path.join(args.output_directory, "state"),
            image_used=used,
            visualizer=visualizer,
        )
        print("[calibrate] report:", {
            k: v for k, v in rep.items() if not isinstance(v, list)
        })
        # calibrate() restores the global x64 config on return; re-enter
        # the scope for the save so the f64 polished state is serialized
        # without f32 truncation (scope is a no-op for pure-f32 runs)
        with cal.float64_cpu_scope() if polish_iterations > 0 \
                else _nullcontext():
            state_io.save_ba_state(
                os.path.join(args.output_directory, "state"), state, used,
                fid_to_idx,
            )
        return 0

    model_kind = args.model or "central_generic"
    # the grid pyramid (coarse-to-fine resampling) applies to BOTH grid
    # model families — the reference runs its pyramid for central and
    # noncentral generic models alike (calibration.cc:1050-1094 with the
    # NoncentralGeneric resample special case at :383-421); parametric
    # models calibrate at their final parameterization directly
    n_pyramid = (
        args.num_pyramid_levels
        if model_kind in ("central_generic", "noncentral_generic")
        else 1
    )

    # Dense-initialization disk cache (reference: the
    # --dense_initialization_base_path save/reload, calibration.cc:948-974)
    results = None
    dip = getattr(args, "dense_initialization_base_path", None)
    if dip:
        from camera_calibration_tpu.init.dense_init import load_dense_init

        cache_file = dip if str(dip).endswith(".npz") else dip + ".npz"
        if os.path.exists(cache_file):
            try:
                cached = load_dense_init(cache_file)
            except Exception as e:
                print(f"[init] could not load cache {cache_file}: {e}")
                cached = None
            if cached is not None and (
                len(cached) != dataset.num_cameras
                or any(r is not None
                       and len(r.image_used) != len(dataset.imagesets)
                       for r in cached)
            ):
                print("[init] cache does not match the dataset; recomputing")
                cached = None
            if cached is not None:
                results = cached
                print(f"[init] loaded dense initialization from {cache_file}")

    if results is None:
        results = []
        for ci in range(dataset.num_cameras):
            if model_kind == "noncentral_generic":
                from camera_calibration_tpu.init.noncentral_init import (
                    NoncentralDenseInitializer,
                )

                init = NoncentralDenseInitializer(
                    dataset, ci, DenseInitOptions(seed=args.seed)
                )
            else:
                init = DenseInitializer(
                    dataset, ci, DenseInitOptions(seed=args.seed)
                )
            res = init.run()
            if res is None:
                print(f"dense initialization failed for camera {ci}")
                return 1
            print(
                f"[init] camera {ci}: {sum(res.image_used)}/"
                f"{len(dataset.imagesets)} imagesets localized"
            )
            results.append(res)
        if dip:
            from camera_calibration_tpu.init.dense_init import save_dense_init

            save_dense_init(dip, results)
            out_name = dip if str(dip).endswith(".npz") else dip + ".npz"
            print(f"[init] saved dense initialization to {out_name}")

    if visualizer is not None:
        for ci, res in enumerate(results):
            if hasattr(res, "observation_directions"):
                dirs, valid = res.observation_directions()
                visualizer.update_initialization(ci, dirs, valid)

    # 3. initial BA state at the coarsest pyramid resolution
    full_res = cal.compute_grid_resolution(
        dataset.image_sizes[0][0], dataset.image_sizes[0][1],
        args.approx_pixels_per_cell,
    )
    coarse = cal.grid_resolution_for_level(n_pyramid - 1, *full_res)
    state, data, fid_to_idx, image_used = build_ba_state(
        dataset, results, (max(4, coarse[1]), max(4, coarse[0])), dtype=dtype,
        model_kind=model_kind,
    )

    # 4. calibrate
    options = cal.CalibrateOptions(
        num_pyramid_levels=n_pyramid,
        approx_pixels_per_cell=args.approx_pixels_per_cell,
        outlier_removal_factor=args.outlier_removal_factor,
        final_iterations=args.final_iterations,
        freeze=("points", "intrinsics") if args.localize_only else (),
        lm_steps_per_call=args.lm_steps_per_call,
        solver=args.solver,
        block_chunk=args.block_chunk,
        cg_warm_start=args.cg_warm_start,
        proj_iterations=args.proj_iterations,
        polish_iterations=polish_iterations,
    )
    state, data, rep = cal.calibrate(
        state,
        data,
        options,
        known_geometries=dataset.known_geometries,
        feature_id_to_point_index=fid_to_idx,
        state_output_path=os.path.join(args.output_directory, "state"),
        image_used=image_used,
        visualizer=visualizer,
    )
    print("[calibrate] report:", {
        k: v for k, v in rep.items() if not isinstance(v, list)
    })

    # 5. save state + report.  calibrate() restores the process-global
    # x64 config on return (library contract); the CLI re-enters the f64
    # scope here so the polished state serializes and reports at full
    # precision (no-op for pure-f32 runs).
    with cal.float64_cpu_scope() if polish_iterations > 0 \
            else _nullcontext():
        state_io.save_ba_state(
            os.path.join(args.output_directory, "state"), state, image_used,
            fid_to_idx,
        )
        if args.report:
            from camera_calibration_tpu.report.calibration_report import (
                create_calibration_report,
            )

            metrics = create_calibration_report(
                os.path.join(args.output_directory, "report"), state, data,
                num_total_imagesets=len(dataset.imagesets),
            )
            for ci, m in enumerate(metrics):
                print(
                    f"[report] camera {ci}: median "
                    f"{m['reprojection_error_median']:.4f} px, avg "
                    f"{m['reprojection_error_average']:.4f} px"
                )
    return 0


def cmd_extract_features(args):
    from camera_calibration_tpu.io import dataset_bin

    dataset = _detect_dataset(
        args.image_directories.split(","), args.pattern_files.split(","), args
    )
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    dataset_bin.save_dataset(args.output, dataset)
    n = sum(
        len(f)
        for s in dataset.imagesets
        for f in s.features
    )
    print(f"saved {args.output}: {len(dataset.imagesets)} imagesets, {n} features")
    return 0


def cmd_record(args):
    """Live capture: camera/video/directory inputs -> detection -> dataset.

    The headless replacement for the reference's live-capture GUI mode
    (reference: main.cc:487-600 live bootstrap + ui/live_image_consumer.cc):
    frames stream from the inputs, features are detected live, imagesets
    with detections accumulate into a dataset.bin, images are optionally
    recorded, and per-camera detection-coverage PNGs give the operator
    feedback on which image regions still need views.
    """
    from camera_calibration_tpu.ba.dataset import Dataset, KnownGeometry
    from camera_calibration_tpu.features import detector as fdet
    from camera_calibration_tpu.features import pattern as pat
    from camera_calibration_tpu.io import dataset_bin
    from camera_calibration_tpu.io.image_input import create_image_input
    from camera_calibration_tpu.ui.live_capture import (
        LiveCaptureOptions,
        LiveImageConsumer,
        run_live_capture,
    )

    patterns = [pat.load_pattern_yaml(p) for p in args.pattern_files.split(",")]
    det = fdet.FeatureDetector(patterns)

    image_input = create_image_input(args.inputs)
    n_cam = image_input.num_cameras
    dataset = Dataset(num_cameras=n_cam, image_sizes=[])
    for pi, spec in enumerate(patterns):
        dataset.known_geometries.append(
            KnownGeometry(
                cell_length_in_meters=spec.square_length_in_meters,
                feature_id_to_position=dict(det.corner_maps[pi]),
            )
        )

    os.makedirs(args.output_directory, exist_ok=True)
    record_dirs = [
        os.path.join(args.output_directory, f"images_camera{ci}")
        for ci in range(n_cam)
    ]
    options = LiveCaptureOptions(
        live_detection=not args.no_live_detection,
        record_images=args.record_images,
        record_with_detections_only=not args.record_all_images,
        capture_interval=args.capture_interval,
        max_imagesets=args.max_imagesets,
        visualization_directory=args.output_directory,
    )
    consumer = LiveImageConsumer(dataset, det, options,
                                 record_directories=record_dirs)

    # optional fullscreen on-screen pattern for screen-based calibration
    # (the reference's PatternDisplay, ui/pattern_display.cc).  HighGUI
    # is main-thread-only on macOS and flaky off-main on some Qt builds,
    # so the DISPLAY stays on this thread and the capture loop moves to a
    # worker; a shared Event lets either side end the other (quit key
    # stops capture, capture exhaustion closes the window).
    display = None
    if getattr(args, "show_pattern", False):
        from camera_calibration_tpu.ui.pattern_display import PatternDisplay

        if not PatternDisplay.available():
            print("[record] --show_pattern: no display available; skipping")
        else:
            display = PatternDisplay(patterns[0])

    with image_input:
        if display is not None:
            import threading

            stop = threading.Event()
            result = {"kept": 0}

            def _capture():
                try:
                    result["kept"] = run_live_capture(
                        image_input, consumer, stop_event=stop
                    )
                finally:
                    stop.set()

            worker = threading.Thread(target=_capture, daemon=True)
            worker.start()
            display.run(stop_event=stop)
            worker.join()
            kept = result["kept"]
        else:
            kept = run_live_capture(image_input, consumer)

    out = os.path.join(args.output_directory, "dataset.bin")
    dataset_bin.save_dataset(out, dataset)
    n_feat = sum(len(f) for s in dataset.imagesets for f in s.features)
    print(
        f"recorded {kept} imagesets ({n_feat} features, "
        f"{consumer.num_recorded} image sets written) -> {out}"
    )
    return 0


def cmd_report(args):
    from camera_calibration_tpu.ba.dataset import split_by_camera
    from camera_calibration_tpu.io import dataset_bin, state_io
    from camera_calibration_tpu.report.calibration_report import (
        create_calibration_report,
    )

    state, used, fid_map = state_io.load_ba_state(args.state_directory)
    dataset = dataset_bin.load_datasets(args.dataset_files)
    # build per-camera observation tables
    from camera_calibration_tpu.init.state_init import build_ba_state  # noqa
    import numpy as np
    import jax.numpy as jnp
    from camera_calibration_tpu.ba.dataset import ObservationTable

    data = []
    for ci in range(dataset.num_cameras):
        ims, ptids, pixels = [], [], []
        for i, s in enumerate(dataset.imagesets):
            if i < len(used) and not used[i]:
                continue
            for f in s.features[ci]:
                if f.feature_id in fid_map:
                    ims.append(i)
                    ptids.append(fid_map[f.feature_id])
                    pixels.append(np.asarray(f.xy, np.float64))
        data.append(
            ObservationTable(
                imageset=jnp.asarray(np.array(ims, np.int32)),
                camera=jnp.full(len(ims), ci, jnp.int32),
                point=jnp.asarray(np.array(ptids, np.int32)),
                pixel=jnp.asarray(np.stack(pixels) if ims else np.zeros((0, 2))),
                valid=jnp.ones(len(ims), bool),
            )
        )
    metrics = create_calibration_report(
        args.output_directory, state, tuple(data),
        num_total_imagesets=len(dataset.imagesets),
    )
    for ci, m in enumerate(metrics):
        print(f"camera {ci}: {m}")
    return 0


def cmd_create_pattern(args):
    import numpy as np

    from camera_calibration_tpu.features import pattern as pat

    tags = []
    if args.apriltags:
        # place one tag in the middle, like the reference default patterns
        tw = max(2, args.squares_x // 5)
        tags = [
            pat.AprilTagInfo(
                x=(args.squares_x - tw) // 2,
                y=(args.squares_y - tw) // 2,
                width=tw,
                height=tw,
                index=args.first_tag_index,
            )
        ]
    spec = pat.PatternSpec(
        num_star_segments=args.num_star_segments,
        squares_x=args.squares_x,
        squares_y=args.squares_y,
        square_length_in_meters=args.square_length_in_meters,
        tags=tags,
    )
    os.makedirs(args.output_directory, exist_ok=True)
    base = os.path.join(
        args.output_directory,
        f"pattern_resolution_{args.squares_x}x{args.squares_y}"
        f"_segments_{args.num_star_segments}",
    )
    pat.save_pattern_yaml(spec, base + ".yaml")
    # print-ready vector PDF at true physical scale (the reference's
    # scripts/create_calibration_pattern.py emits PDF via reportlab)
    pat.save_pattern_pdf(spec, base + ".pdf")
    # plus a raster preview at the requested dpi
    px_per_square = args.dpi_pixels_per_square
    h_img = np.array(
        [
            [1.0 / px_per_square, 0.0, -1.5],
            [0.0, 1.0 / px_per_square, -1.5],
            [0.0, 0.0, 1.0],
        ]
    )
    w = px_per_square * (spec.squares_x + 1)
    h = px_per_square * (spec.squares_y + 1)
    img = pat.render_pattern(
        spec, h_img, (w, h), supersample=2,
        tag_renderer=pat.make_tag_renderer(spec) if tags else None,
    )
    import cv2

    cv2.imwrite(base + ".png", (img * 255).astype(np.uint8))
    print(f"wrote {base}.yaml, {base}.pdf and {base}.png")
    return 0


def cmd_stereo_depth(args):
    """Stereo depth on a calibrated 2-camera rig (reference:
    tools/stereo_depth_estimation.cc)."""
    import numpy as np
    import jax.numpy as jnp

    from camera_calibration_tpu.io import state_io
    from camera_calibration_tpu.ops import se3
    from camera_calibration_tpu.stereo import patch_match as pms

    state, _, _ = state_io.load_ba_state(args.state_directory)
    if len(state.intrinsics) < 2:
        print("stereo-depth needs a 2-camera rig state")
        return 1
    img_l = _load_gray(args.left_image).astype(np.float64) / 255.0
    img_r = _load_gray(args.right_image).astype(np.float64) / 255.0
    # other_tr_ref = cam1_tr_rig ∘ (cam0_tr_rig)⁻¹  (rig frame = cam0 anchor)
    q0, t0 = state.cam_q_rig[0], state.cam_t_rig[0]
    q1, t1 = state.cam_q_rig[1], state.cam_t_rig[1]
    qi, ti = se3.se3_inverse(q0, t0)
    qr, tr = se3.se3_compose(q1, t1, qi, ti)
    r_rel = np.asarray(se3.quat_to_matrix(qr))
    t_rel = np.asarray(tr)
    opts = pms.PatchMatchOptions(
        min_depth=args.min_depth, max_depth=args.max_depth,
        num_levels=args.num_levels, iterations=args.iterations,
    )
    result_l = pms.compute_depth_map(
        jnp.asarray(img_l), jnp.asarray(img_r),
        state.intrinsics[0], state.intrinsics[1], (r_rel, t_rel), opts,
        algorithm=args.algorithm,
    )
    # LR consistency: a cheaper second pass from the right camera
    # (the reference runs 30 iterations for the consistency map and 50
    # for the reference view, stereo_depth_estimation.cc:180-186)
    import dataclasses as _dc

    opts_r = _dc.replace(opts, iterations=max(2, args.iterations // 2))
    r_inv = r_rel.T
    t_inv = -r_rel.T @ t_rel
    result_r = pms.compute_depth_map(
        jnp.asarray(img_r), jnp.asarray(img_l),
        state.intrinsics[1], state.intrinsics[0], (r_inv, t_inv), opts_r,
        algorithm=args.algorithm,
    )
    mask = pms.lr_consistency_mask(
        result_l, result_r, state.intrinsics[0], state.intrinsics[1],
        (r_rel, t_rel),
    )
    import numpy as _np

    # post-filter chain: bilateral smoothing + speckle removal
    inv_f = pms.bilateral_filter(result_l["inv_depth"], jnp.asarray(img_l))
    result_l = dict(result_l)
    result_l["inv_depth"] = inv_f
    result_l["depth"] = 1.0 / jnp.maximum(inv_f, 1e-9)
    mask = _np.asarray(mask) & _np.isfinite(_np.asarray(result_l["cost"]))
    mask = pms.connected_component_filter(
        mask, result_l["inv_depth"], min_size=args.min_component_size
    )
    pms.export_point_cloud(args.output, result_l, mask=mask, colors=img_l)
    # companion MeshLab project referencing the exported cloud
    # (reference: libvis/external_io/meshlab_project.h)
    from camera_calibration_tpu.io.meshlab import export_stereo_project

    mlp_path = os.path.splitext(args.output)[0] + ".mlp"
    export_stereo_project(mlp_path, [args.output])
    print(
        f"wrote {args.output}: {int(mask.sum())} points "
        f"({100.0 * mask.mean():.1f}% consistent); project {mlp_path}"
    )
    return 0


def cmd_render_synthetic(args):
    """Render a synthetic dataset of pattern views from a pinhole GT camera
    (reference: tools/render_synthetic_dataset.cc:43)."""
    import numpy as np
    import cv2

    from camera_calibration_tpu.features import pattern as pat

    spec = pat.load_pattern_yaml(args.pattern_file)
    rng = np.random.default_rng(args.seed)
    w, h = args.width, args.height
    fx = fy = 0.85 * w
    cx, cy = 0.5 * w, 0.5 * h
    os.makedirs(args.output_directory, exist_ok=True)
    cell = spec.square_length_in_meters
    off_x = (spec.squares_x - 1) * cell / 2
    off_y = (spec.squares_y - 1) * cell / 2
    k_mat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    renderer = pat.make_tag_renderer(spec) if spec.tags else None

    def _rodrigues(a):
        # host NumPy: per-image jnp scalar math would compile each tiny
        # op on the (possibly remote) accelerator — measured ~0.6 s per
        # compile, dominating the whole render
        th = np.linalg.norm(a)
        if th < 1e-12:
            return np.eye(3)
        k = a / th
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx

    for i in range(args.num_images):
        r = _rodrigues(rng.normal(0, 0.12, 3))
        t = np.array(
            [-off_x + rng.normal(0, 0.05), -off_y + rng.normal(0, 0.05),
             rng.uniform(args.min_z, args.max_z)]
        )
        h_pp = k_mat @ np.c_[r[:, :2] * cell, t]
        img = pat.render_pattern(
            spec, np.linalg.inv(h_pp), (w, h), supersample=3,
            tag_renderer=renderer,
        )
        from camera_calibration_tpu.features.degrade import degrade

        img = degrade(
            img, rng,
            vignetting=args.vignetting,
            defocus_sigma=args.defocus_sigma,
            jpeg_quality=args.jpeg_quality,
            exposure_drift=args.exposure_drift,
            noise=args.noise,
        )
        cv2.imwrite(
            os.path.join(args.output_directory, f"synthetic_{i:04d}.png"),
            (img * 255).astype(np.uint8),
        )
    print(f"rendered {args.num_images} images to {args.output_directory}")
    return 0


def cmd_localization_accuracy(args):
    """Monte-Carlo localization accuracy comparison of two calibrations
    (reference: tools/localization_accuracy_test.cc:47-90)."""
    import numpy as np
    import jax.numpy as jnp

    from camera_calibration_tpu.init.p3p import ransac_p3p
    from camera_calibration_tpu.io import state_io
    from camera_calibration_tpu.models import protocol

    state_gt, _, _ = state_io.load_ba_state(args.gt_state)
    state_cmp, _, _ = state_io.load_ba_state(args.compared_state)
    model_gt = state_gt.intrinsics[args.camera_index]
    model_cmp = state_cmp.intrinsics[args.camera_index]
    rng = np.random.default_rng(args.seed)
    w, h = model_gt.width, model_gt.height
    pos_errors, rot_errors = [], []
    for _ in range(args.trials):
        # 15 random pixels unprojected with the GT model at 1.5-2.5 m
        px = rng.uniform([5, 5], [w - 5, h - 5], (15, 2))
        d_gt, _ = protocol.unproject(model_gt, jnp.asarray(px))
        depth = rng.uniform(1.5, 2.5, (15, 1))
        pts = np.asarray(d_gt) * depth  # world == camera frame (identity GT)
        d_cmp, _ = protocol.unproject(model_cmp, jnp.asarray(px))
        out = ransac_p3p(
            np.asarray(d_cmp), pts, max_iterations=20,
            seed=int(rng.integers(1 << 31)),
        )
        if out is None:
            continue
        r, t, _ = out
        pos_errors.append(np.linalg.norm(t))  # GT camera center = 0
        ang = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
        rot_errors.append(ang)
    pos_errors = np.asarray(pos_errors)
    rot_errors = np.asarray(rot_errors)
    print(
        f"localization over {len(pos_errors)} trials: position error "
        f"median {np.median(pos_errors):.6f} m, p90 "
        f"{np.percentile(pos_errors, 90):.6f} m; rotation error median "
        f"{np.median(rot_errors):.5f} deg"
    )
    return 0


def cmd_fit_parametric(args):
    """Fit parametric models to a generic calibration + residual report
    (reference: fitting_report.h:56,206)."""
    from camera_calibration_tpu.io import state_io
    from camera_calibration_tpu.report.fitting_report import fit_and_report

    state, _, _ = state_io.load_ba_state(args.state_directory)
    model = state.intrinsics[args.camera_index]
    fit_and_report(model, args.output_directory,
                   model_names=tuple(args.models.split(",")),
                   co_estimate_rotation=args.co_estimate_rotation)
    return 0


def cmd_create_legends(args):
    """Write legend images for the report visualizations
    (reference: tools/create_legends.cc)."""
    import numpy as np
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.colors as mcolors

    os.makedirs(args.output_directory, exist_ok=True)

    # error-direction hue wheel
    n = 512
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    r = np.hypot(xx, yy)
    ang = np.arctan2(yy, xx)
    hue = (ang + np.pi) / (2 * np.pi)
    val = np.clip(r, 0, 1)
    rgb = mcolors.hsv_to_rgb(np.stack([hue, np.ones_like(hue), val], -1))
    rgb[r > 1] = 1.0
    fig, ax = plt.subplots(figsize=(4, 4), dpi=100)
    ax.imshow(rgb, extent=[-1, 1, 1, -1])
    ax.set_title("error direction (hue) / magnitude (value)")
    ax.set_xlabel("error x")
    ax.set_ylabel("error y")
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_directory,
                             "legend_error_directions.png"))
    plt.close(fig)

    # magnitude colorbar legend
    fig, ax = plt.subplots(figsize=(4, 1.2), dpi=100)
    grad = np.linspace(0, 1, 256)[None, :]
    ax.imshow(grad, aspect="auto", cmap="inferno",
              extent=[0, args.max_error_px, 0, 1])
    ax.set_yticks([])
    ax.set_xlabel("mean |reprojection error| [px]")
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_directory,
                             "legend_error_magnitudes.png"))
    plt.close(fig)

    # observation-direction xyz->rgb legend
    fig, ax = plt.subplots(figsize=(4, 1.2), dpi=100)
    ax.axis("off")
    ax.text(0.0, 0.6, "observation directions:", fontsize=10)
    ax.text(0.0, 0.2, "r = (x+1)/2   g = (y+1)/2   b = (z+1)/2", fontsize=10)
    fig.savefig(os.path.join(args.output_directory,
                             "legend_observation_directions.png"))
    plt.close(fig)
    print(f"wrote legends to {args.output_directory}")
    return 0


def _kalibr_load_cameras(path):
    """Load a Kalibr camchain YAML -> {index: parametric model}.

    Supported camera/distortion models: pinhole + radtan (-> OpenCV
    k1 k2 p1 p2), pinhole + equidistant (-> thin-prism fisheye k1..k4
    with the equidistant pre-step), pinhole without distortion.
    (reference analog: tools/visualize_calibration.cc Kalibr input)
    """
    import yaml
    import numpy as np
    import jax.numpy as jnp

    from camera_calibration_tpu.models import parametric as pm
    from camera_calibration_tpu.models import pinhole as ph

    with open(path) as f:
        doc = yaml.safe_load(f)
    cams = {}
    for key, spec in doc.items():
        if not key.startswith("cam"):
            continue
        idx = int(key[3:])
        fu, fv, pu, pv = spec["intrinsics"]
        w, h = spec["resolution"]
        dist_model = spec.get("distortion_model", "none")
        coeffs = spec.get("distortion_coeffs", []) or []
        if dist_model == "radtan":
            params = np.zeros(12)
            params[:4] = [fu, fv, pu, pv]
            if len(coeffs) >= 2:
                params[4:6] = coeffs[:2]  # k1 k2
            if len(coeffs) >= 4:
                params[10:12] = coeffs[2:4]  # p1 p2
            cams[idx] = pm.CentralOpenCVModel(
                params=jnp.asarray(params), width=int(w), height=int(h)
            )
        elif dist_model == "equidistant":
            params = np.zeros(12)
            params[:4] = [fu, fv, pu, pv]
            params[4:4 + min(4, len(coeffs))] = coeffs[:4]
            cams[idx] = pm.CentralThinPrismFisheyeModel(
                params=jnp.asarray(params), width=int(w), height=int(h),
                use_equidistant_projection=True,
            )
        else:
            cams[idx] = ph.make_pinhole(fu, fv, pu, pv, int(w), int(h))
    return cams


def _visualize_camera(model, base_path, name):
    """Direction-field + distortion-displacement visualizations."""
    import numpy as np
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from camera_calibration_tpu.models import protocol

    w, h = model.width, model.height
    ys = np.linspace(1, h - 2, 120)
    xs = np.linspace(1, w - 2, 160)
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))
    dirs, valid = protocol.unproject(model, px)
    dirs = np.asarray(dirs).reshape(len(ys), len(xs), 3)
    valid = np.asarray(valid).reshape(len(ys), len(xs))
    rgb = 0.5 * (dirs + 1.0)
    rgb[~valid] = 0.0
    fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
    ax.imshow(np.clip(rgb, 0, 1))
    ax.set_title(f"{name}: observation directions")
    fig.tight_layout()
    fig.savefig(base_path + "_directions.png")
    plt.close(fig)

    # distortion displacement: |pixel - ideal pinhole projection| using a
    # central-region pinhole approximation
    z = np.maximum(dirs[..., 2], 1e-9)
    nx = dirs[..., 0] / z
    ny = dirs[..., 1] / z
    center = valid & (np.hypot(nx, ny) < 0.2)
    if center.sum() > 16:
        a = np.zeros((2 * int(center.sum()), 4))
        a[0::2, 0] = nx[center]
        a[0::2, 2] = 1.0
        a[1::2, 1] = ny[center]
        a[1::2, 3] = 1.0
        rhs = np.stack([gx[center], gy[center]], -1).reshape(-1)
        sol, *_ = np.linalg.lstsq(a, rhs, rcond=None)
        ideal_x = sol[0] * nx + sol[2]
        ideal_y = sol[1] * ny + sol[3]
        disp = np.hypot(ideal_x - gx, ideal_y - gy)
        disp[~valid] = np.nan
        fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
        im = ax.imshow(disp, cmap="viridis")
        fig.colorbar(im, ax=ax, label="distortion displacement [px]")
        ax.set_title(f"{name}: distortion vs central pinhole")
        fig.tight_layout()
        fig.savefig(base_path + "_distortion.png")
        plt.close(fig)


def cmd_visualize_calibration(args):
    """Visualize a calibration from a Kalibr camchain YAML, a COLMAP
    model directory, or one of our state directories
    (reference: tools/visualize_calibration.cc)."""
    os.makedirs(args.output_directory, exist_ok=True)
    cams = {}
    if args.kalibr_yaml:
        cams = _kalibr_load_cameras(args.kalibr_yaml)
        tag = "kalibr"
    elif args.colmap_model:
        from camera_calibration_tpu.io import colmap

        model = colmap.read_model(args.colmap_model)
        cams = {cid - 1: c for cid, c in model.cameras.items()}
        tag = "colmap"
    elif args.state_directory:
        from camera_calibration_tpu.io import state_io

        state, _, _ = state_io.load_ba_state(args.state_directory)
        cams = dict(enumerate(state.intrinsics))
        tag = "state"
    else:
        print("need --kalibr_yaml, --colmap_model, or --state_directory")
        return 1
    for idx, cam in cams.items():
        base = os.path.join(args.output_directory, f"{tag}_camera{idx}")
        _visualize_camera(cam, base, f"{tag} camera {idx}")
        print(f"wrote {base}_directions.png")
    return 0


def cmd_refine_colmap(args):
    """Bundle-adjust a COLMAP model (poses + points + parametric
    intrinsics) with the joint LM solver
    (reference: tools/bundle_adjustment.cc:50,190)."""
    import numpy as np
    import jax.numpy as jnp

    from camera_calibration_tpu.ba import lm_pcg
    from camera_calibration_tpu.ba.dataset import ObservationTable
    from camera_calibration_tpu.ba.state import BAState
    from camera_calibration_tpu.io import colmap
    from camera_calibration_tpu.ops import se3

    model = colmap.read_model(args.colmap_model)
    cam_ids = sorted(model.cameras.keys())
    cam_index = {cid: i for i, cid in enumerate(cam_ids)}
    pt_ids = sorted(model.points3d.keys())
    pt_index = {pid: i for i, pid in enumerate(pt_ids)}
    pts = np.stack([model.points3d[pid][0] for pid in pt_ids])

    # COLMAP images are independent poses: each image becomes its own
    # "imageset" with the rig anchored at identity; intrinsics per camera.
    rig_q, rig_t = [], []
    ims, cams_col, ptids, pixels = [], [], [], []
    for si, im in enumerate(model.images):
        rig_q.append(np.asarray(im.q, float))
        rig_t.append(np.asarray(im.t, float))
        for (x, y, pid) in im.points2d:
            if pid < 0 or pid not in pt_index:
                continue
            ims.append(si)
            cams_col.append(cam_index[im.camera_id])
            ptids.append(pt_index[pid])
            pixels.append([x, y])
    n_cams = len(cam_ids)
    # camera-major sort
    order = np.lexsort((np.array(ims), np.array(cams_col)))
    ims = np.array(ims, np.int32)[order]
    cams_col = np.array(cams_col, np.int32)[order]
    ptids = np.array(ptids, np.int32)[order]
    pixels = np.array(pixels, float)[order]

    state = BAState(
        rig_q_global=jnp.asarray(np.stack(rig_q)),
        rig_t_global=jnp.asarray(np.stack(rig_t)),
        cam_q_rig=jnp.asarray(
            np.tile([1.0, 0, 0, 0], (n_cams, 1))
        ),
        cam_t_rig=jnp.zeros((n_cams, 3)),
        points=jnp.asarray(pts),
        intrinsics=tuple(model.cameras[cid] for cid in cam_ids),
    )
    data = []
    for c in range(n_cams):
        m = cams_col == c
        data.append(ObservationTable(
            imageset=jnp.asarray(ims[m]),
            camera=jnp.asarray(cams_col[m]),
            point=jnp.asarray(ptids[m]),
            pixel=jnp.asarray(pixels[m]),
            valid=jnp.ones(int(m.sum()), bool),
        ))
    freeze = {f for f in args.freeze.split(",") if f}
    # COLMAP poses live in rig_tr_global; the per-camera extrinsics are a
    # redundant identity here and stay frozen
    freeze.add("extrinsics")
    options = lm_pcg.BAOptions(
        max_lm_iterations=args.iterations,
        max_pcg_iterations=60,
        cost_reduction_threshold=1e-7,
        freeze=tuple(sorted(freeze)),
    )
    state, info = lm_pcg.optimize(state, None, None, options,
                                  data=tuple(data))
    print(f"[refine-colmap] final cost {info['final_cost']}")

    # write back
    new_images = []
    for si, im in enumerate(model.images):
        new_images.append(colmap.ColmapImage(
            image_id=im.image_id,
            q=np.asarray(state.rig_q_global[si]),
            t=np.asarray(state.rig_t_global[si]),
            camera_id=im.camera_id,
            name=im.name,
            points2d=im.points2d,
        ))
    new_pts = {}
    pts_out = np.asarray(state.points)
    for pid in pt_ids:
        xyz, rgb, err, track = model.points3d[pid]
        new_pts[pid] = (pts_out[pt_index[pid]], rgb, err, track)
    new_cams = {
        cid: state.intrinsics[cam_index[cid]] for cid in cam_ids
    }
    colmap.write_model(args.output_directory, colmap.ColmapModel(
        cameras=new_cams, images=new_images, points3d=new_pts,
    ))
    print(f"wrote refined COLMAP model to {args.output_directory}")
    return 0


def cmd_intersect_datasets(args):
    """Keep only features detected in all datasets within a pixel
    threshold, matched by filename (reference: intersect_datasets.cc:41)."""
    import numpy as np

    from camera_calibration_tpu.io import dataset_bin

    datasets = [dataset_bin.load_dataset(p) for p in args.dataset_files]
    base = datasets[0]

    def key_of(s, i):
        return s.filenames[0] if s.filenames else str(i)

    others_by_name = [
        {key_of(s, i): s for i, s in enumerate(d.imagesets)}
        for d in datasets[1:]
    ]
    kept = 0
    dropped = 0
    for i, s in enumerate(base.imagesets):
        name = key_of(s, i)
        partners = [m.get(name) for m in others_by_name]
        for ci in range(base.num_cameras):
            out_feats = []
            for f in s.features[ci]:
                ok = True
                for p_set in partners:
                    if p_set is None:
                        ok = False
                        break
                    match = [
                        g for g in p_set.features[ci]
                        if g.feature_id == f.feature_id
                        and np.linalg.norm(np.asarray(g.xy) - np.asarray(f.xy))
                        <= args.threshold
                    ]
                    if not match:
                        ok = False
                        break
                if ok:
                    out_feats.append(f)
                    kept += 1
                else:
                    dropped += 1
            s.features[ci] = out_feats
    dataset_bin.save_dataset(args.output, base)
    print(f"kept {kept}, dropped {dropped}; wrote {args.output}")
    return 0


def cmd_compare_point_clouds(args):
    """Similarity-align two point clouds (scaled umeyama) + distance stats
    (reference: compare_point_clouds.cc:140-153)."""
    import numpy as np

    def load_obj(p):
        pts = []
        for line in open(p):
            if line.startswith("v "):
                v = line.split()
                pts.append([float(v[1]), float(v[2]), float(v[3])])
        return np.asarray(pts)

    a = load_obj(args.cloud_a)
    b = load_obj(args.cloud_b)
    n = min(len(a), len(b))
    if args.paired:
        a, b = a[:n], b[:n]
        # umeyama with scaling: align a -> b
        mu_a, mu_b = a.mean(0), b.mean(0)
        ac, bc = a - mu_a, b - mu_b
        cov = bc.T @ ac / n
        u, dvals, vt = np.linalg.svd(cov)
        s_mat = np.eye(3)
        if np.linalg.det(u) * np.linalg.det(vt) < 0:
            s_mat[2, 2] = -1
        r = u @ s_mat @ vt
        var_a = (ac**2).sum() / n
        c = np.trace(np.diag(dvals) @ s_mat) / var_a
        t = mu_b - c * r @ mu_a
        a_aligned = c * a @ r.T + t
        d = np.linalg.norm(a_aligned - b, axis=-1)
        print(
            f"paired alignment: scale {c:.6f}; distance median "
            f"{np.median(d):.6f} mean {d.mean():.6f} max {d.max():.6f}"
        )
    else:
        # nearest-neighbor distances (no correspondence)
        from scipy.spatial import cKDTree

        tree = cKDTree(b)
        d, _ = tree.query(a, k=1)
        print(
            f"nn distances a->b: median {np.median(d):.6f} mean "
            f"{d.mean():.6f} p90 {np.percentile(d, 90):.6f}"
        )
    return 0


def cmd_convert_dataset(args):
    """Convert dataset.bin <-> JSON interchange
    (reference: convert_dataset.cc)."""
    import json

    import numpy as np

    from camera_calibration_tpu.ba.dataset import (
        Dataset, Imageset, KnownGeometry, PointFeature,
    )
    from camera_calibration_tpu.io import dataset_bin

    if args.input.endswith(".bin"):
        ds = dataset_bin.load_dataset(args.input)
        doc = {
            "num_cameras": ds.num_cameras,
            "image_sizes": [list(s) for s in ds.image_sizes],
            "imagesets": [
                {
                    "filename": (s.filenames[0] if s.filenames else ""),
                    "features": [
                        [
                            {"x": float(f.xy[0]), "y": float(f.xy[1]),
                             "id": int(f.feature_id)}
                            for f in cam_feats
                        ]
                        for cam_feats in s.features
                    ],
                }
                for s in ds.imagesets
            ],
            "known_geometries": [
                {
                    "cell_length_in_meters": g.cell_length_in_meters,
                    "feature_id_to_position": {
                        str(k): list(v)
                        for k, v in g.feature_id_to_position.items()
                    },
                }
                for g in ds.known_geometries
            ],
        }
        with open(args.output, "w") as f:
            json.dump(doc, f)
    else:
        with open(args.input) as f:
            doc = json.load(f)
        ds = Dataset(
            num_cameras=doc["num_cameras"],
            image_sizes=[tuple(s) for s in doc["image_sizes"]],
            imagesets=[
                Imageset(
                    features=[
                        [
                            PointFeature(
                                xy=np.array([f["x"], f["y"]]),
                                feature_id=f["id"],
                            )
                            for f in cam_feats
                        ]
                        for cam_feats in s["features"]
                    ],
                    filenames=[s.get("filename", "")],
                )
                for s in doc["imagesets"]
            ],
            known_geometries=[
                KnownGeometry(
                    cell_length_in_meters=g["cell_length_in_meters"],
                    feature_id_to_position={
                        int(k): tuple(v)
                        for k, v in g["feature_id_to_position"].items()
                    },
                )
                for g in doc["known_geometries"]
            ],
        )
        dataset_bin.save_dataset(args.output, ds)
    print(f"converted {args.input} -> {args.output}")
    return 0


def cmd_export_colmap(args):
    """Export a saved calibration state to a COLMAP text model
    (reference: libvis external_io/colmap_model.h)."""
    from camera_calibration_tpu.io import colmap, dataset_bin, state_io

    state, used, fid_map = state_io.load_ba_state(args.state_directory)
    dataset = (
        dataset_bin.load_datasets(args.dataset_files)
        if args.dataset_files
        else None
    )
    colmap.export_ba_state(args.output_directory, state, dataset, used, fid_map)
    print(f"wrote COLMAP model to {args.output_directory}")
    return 0


def cmd_compare(args):
    """Fitting-error comparison of two calibrations (reference:
    tools/compare_calibrations.cc)."""
    import numpy as np
    import jax.numpy as jnp

    from camera_calibration_tpu.io import state_io
    from camera_calibration_tpu.models import protocol

    state_a, _, _ = state_io.load_ba_state(args.state_a)
    state_b, _, _ = state_io.load_ba_state(args.state_b)
    for ci, (ma, mb) in enumerate(zip(state_a.intrinsics, state_b.intrinsics)):
        w, h = ma.width, ma.height
        xs = np.linspace(2, w - 3, 80)
        ys = np.linspace(2, h - 3, 60)
        gx, gy = np.meshgrid(xs, ys)
        px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))
        da, va = protocol.unproject(ma, px)
        db, vb = protocol.unproject(mb, px)
        m = np.asarray(va & vb)
        ang = np.degrees(
            np.arccos(
                np.clip(np.sum(np.asarray(da)[m] * np.asarray(db)[m], -1), -1, 1)
            )
        )
        print(
            f"camera {ci}: direction angle diff deg median "
            f"{np.median(ang):.6f} max {ang.max():.6f}"
        )
    return 0


def cmd_compare_reconstructions(args):
    """State-vs-state reconstruction comparison (reference:
    tools/bundle_adjustment.cc:223-396 CompareReconstructions).

    Loads two saved BA states, Umeyama-aligns their camera-0 centers
    with scale, estimates the intrinsics rotation between the two
    calibrations from unprojected pixel-grid directions, aligns the
    trajectories at their first image, and reports: the scale factor,
    per-pose center error stats after the similarity alignment, the
    intrinsics-rotation angle and residual direction errors, and the
    reference's headline metric — the relative endpoint translation
    difference (% of mean trajectory length).  Also writes
    ``reconstructions_aligned_at_start.mlp`` next to the common prefix
    of the two paths when the states' .obj exports exist.
    """
    import numpy as np

    from camera_calibration_tpu.io import state_io
    from camera_calibration_tpu.models import protocol

    def q_to_r(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def global_tr_images(state):
        # x_cam = R(cam_q_rig) (R(rig_q_global) x + rig_t_global) + cam_t_rig
        # (ba/state.transform_to_camera); global_T_image inverts the chain.
        rc = q_to_r(np.asarray(state.cam_q_rig[0], float))
        tc = np.asarray(state.cam_t_rig[0], float)
        rs, ts = [], []
        for q, t in zip(np.asarray(state.rig_q_global, float),
                        np.asarray(state.rig_t_global, float)):
            r_cg = rc @ q_to_r(q)
            t_cg = rc @ np.asarray(t) + tc
            rs.append(r_cg.T)
            ts.append(-r_cg.T @ t_cg)
        return np.stack(rs), np.stack(ts)

    state1, _, _ = state_io.load_ba_state(args.state_a)
    state2, _, _ = state_io.load_ba_state(args.state_b)
    if state1.rig_q_global.shape[0] != state2.rig_q_global.shape[0]:
        print(
            "error: the reconstructions must contain the same images "
            f"({state1.rig_q_global.shape[0]} vs "
            f"{state2.rig_q_global.shape[0]} poses)"
        )
        return 1

    r1, c1 = global_tr_images(state1)  # rotations (M,3,3), centers (M,3)
    r2, c2 = global_tr_images(state2)
    m = c1.shape[0]

    # Umeyama with scale: centers1 -> centers2 (bundle_adjustment.cc:258)
    mu1, mu2 = c1.mean(0), c2.mean(0)
    a_c, b_c = c1 - mu1, c2 - mu2
    cov = b_c.T @ a_c / m
    u, dvals, vt = np.linalg.svd(cov)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    r_align = u @ s_mat @ vt
    var1 = (a_c ** 2).sum() / m
    scale = float(np.trace(np.diag(dvals) @ s_mat) / max(var1, 1e-30))
    t_align = mu2 - scale * r_align @ mu1
    c1_aligned = scale * c1 @ r_align.T + t_align
    center_err = np.linalg.norm(c1_aligned - c2, axis=-1)
    print(f"umeyama scale (state_a -> state_b): {scale:.8f}")
    print(
        f"pose center error after similarity alignment: median "
        f"{np.median(center_err):.6g} mean {center_err.mean():.6g} "
        f"max {center_err.max():.6g}"
    )

    # scale reconstruction 1's trajectory (bundle_adjustment.cc:267-271)
    c1s = scale * c1

    # intrinsics rotation from unprojected pixel-grid line directions
    # (bundle_adjustment.cc:281-300; kPixelStep 10)
    ma, mb = state1.intrinsics[0], state2.intrinsics[0]
    if ma.width != mb.width or ma.height != mb.height:
        print("error: intrinsics image sizes differ")
        return 1
    step = 10
    xs = np.arange(0, ma.width, step) + 0.5
    ys = np.arange(0, ma.height, step) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    px = np.stack([gx, gy], -1).reshape(-1, 2)
    da, va = protocol.unproject(ma, px)
    db, vb = protocol.unproject(mb, px)
    valid = np.asarray(va & vb)
    da = np.asarray(da)[valid]
    db = np.asarray(db)[valid]
    da /= np.linalg.norm(da, axis=-1, keepdims=True)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    # Kabsch: intrinsics1_r_intrinsics2 with da[i] = R db[i]
    u, _, vt = np.linalg.svd(da.T @ db)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    r_intr = u @ s_mat @ vt
    ang = np.degrees(
        np.arccos(np.clip(0.5 * (np.trace(r_intr) - 1.0), -1.0, 1.0))
    )
    resid = np.degrees(
        np.arccos(np.clip(np.sum(da * (db @ r_intr.T), -1), -1.0, 1.0))
    )
    print(
        f"intrinsics rotation between calibrations: {ang:.6f} deg; "
        f"rotation-aligned direction error: median {np.median(resid):.6f} "
        f"max {resid.max():.6f} deg"
    )

    # align at the first image, measure the endpoint difference relative
    # to the mean trajectory length (bundle_adjustment.cc:302-326)
    r_first = np.eye(4)
    r_first[:3, :3] = r_intr
    g1_first = np.eye(4)
    g1_first[:3, :3] = r1[0]
    g1_first[:3, 3] = c1s[0]
    g2_first = np.eye(4)
    g2_first[:3, :3] = r2[0]
    g2_first[:3, 3] = c2[0]
    first1_tr_first2 = g1_first @ r_first @ np.linalg.inv(g2_first)
    back2 = np.eye(4)
    back2[:3, :3] = r2[-1]
    back2[:3, 3] = c2[-1]
    back2_in_1 = first1_tr_first2 @ back2
    endpoint_diff = float(np.linalg.norm(back2_in_1[:3, 3] - c1s[-1]))
    traj1 = float(np.linalg.norm(np.diff(c1s, axis=0), axis=-1).sum())
    traj2 = float(np.linalg.norm(np.diff(c2, axis=0), axis=-1).sum())
    rel = endpoint_diff / max(0.5 * (traj1 + traj2), 1e-30)
    print(f"relative endpoint difference: {100.0 * rel:.4f}%")

    # MeshLab project with the aligned transforms (cc:328-377)
    obj1_cloud = os.path.join(os.path.abspath(args.state_a), "points.yaml.obj")
    obj1_poses = os.path.join(
        os.path.abspath(args.state_a), "rig_tr_global.yaml.obj"
    )
    obj2_cloud = os.path.join(os.path.abspath(args.state_b), "points.yaml.obj")
    obj2_poses = os.path.join(
        os.path.abspath(args.state_b), "rig_tr_global.yaml.obj"
    )
    if all(os.path.exists(p)
           for p in (obj1_cloud, obj1_poses, obj2_cloud, obj2_poses)):
        from camera_calibration_tpu.io.meshlab import (
            MeshLabMeshInfo,
            write_meshlab_project,
        )

        prefix = os.path.commonpath(
            [os.path.abspath(args.state_a), os.path.abspath(args.state_b)]
        )
        g1 = np.eye(4)
        g1[0, 0] = g1[1, 1] = g1[2, 2] = scale
        meshes = [
            MeshLabMeshInfo("SfM cloud 1", obj1_cloud, g1),
            MeshLabMeshInfo("SfM camera poses 1", obj1_poses, g1),
            MeshLabMeshInfo("SfM cloud 2", obj2_cloud, first1_tr_first2),
            MeshLabMeshInfo("SfM camera poses 2", obj2_poses,
                            first1_tr_first2),
        ]
        mlp = os.path.join(prefix, "reconstructions_aligned_at_start.mlp")
        write_meshlab_project(mlp, meshes)
        print(f"wrote {mlp}")
    return 0


def main(argv=None):
    # CLI entry point: the persistent XLA compilation cache is safe and
    # valuable here (one process, one backend); library imports do NOT
    # get it by default (see config.configure_compilation_cache).
    from camera_calibration_tpu import config as _config

    _config.configure_compilation_cache(entry_point=True)
    parser = argparse.ArgumentParser(
        prog="camera-calibration-tpu",
        description="TPU-native generic camera calibration",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("calibrate", help="full calibration pipeline")
    p.add_argument("--image_directories", help="comma-separated, one per camera")
    p.add_argument("--pattern_files", help="comma-separated pattern YAMLs")
    p.add_argument("--dataset_files", help="existing dataset.bin")
    p.add_argument("--output_directory", required=True)
    p.add_argument(
        "--model", default=None,
        choices=["central_generic", "noncentral_generic",
                 "central_thin_prism_fisheye", "central_opencv",
                 "central_radial"],
        help="camera model (default central_generic for fresh "
             "calibrations; on --state_directory resume, passing this "
             "explicitly resamples/converts the loaded state to the "
             "requested model and resolution and re-runs the pyramid)",
    )
    p.add_argument("--num_pyramid_levels", type=int, default=3)
    p.add_argument("--approx_pixels_per_cell", type=int, default=25)
    p.add_argument("--outlier_removal_factor", type=float, default=8.0)
    p.add_argument("--final_iterations", type=int, default=100)
    p.add_argument(
        "--lm_steps_per_call", type=int, default=1,
        help="LM iterations fused per device call (lax.scan); >1 amortizes remote-dispatch latency, checkpoints every k-th iteration",
    )
    p.add_argument(
        "--dtype", default="mixed",
        choices=["mixed", "float32", "float64"],
        help="mixed (default) runs the pipeline in float32 on the "
             "accelerator (engaging the Pallas kernels) and finishes "
             "with float64 CPU polish iterations, like the reference's "
             "CUDA BA + CPU polish (calibration.cc:1127-1133); float64 "
             "runs everything in f64 (CPU-class path); float32 skips "
             "the polish",
    )
    p.add_argument(
        "--polish_iterations", type=int, default=10,
        help="float64 CPU LM iterations after the f32 pipeline "
             "(mixed dtype only; reference runs 10)",
    )
    p.add_argument(
        "--solver", default="auto",
        choices=["auto", "schur", "schur_poses", "schur_direct",
                 "schur_direct_points", "pcg"],
        help="BA solver mode (the reference's --schur_mode family, "
             "Readme.md:330-352): schur/schur_poses = point/pose "
             "elimination + PCG on the reduced system; schur_direct[_points] "
             "= explicit reduced system + dense Cholesky (exact Newton "
             "step; fastest to converge on small/medium problems, memory "
             "~ reduced-dim^2); pcg = full-system PCG",
    )
    p.add_argument(
        "--block_chunk", type=int, default=None,
        help="evaluate residual/Jacobian blocks in chunks of this many "
             "observations to bound memory (the reference's on-the-fly "
             "SchurModes); must divide the padded table size",
    )
    p.add_argument(
        "--cg_warm_start", action="store_true",
        help="warm-start each PCG solve from the previous LM step "
             "(needs --lm_steps_per_call > 1 and a PCG solver mode)",
    )
    p.add_argument(
        "--proj_iterations", type=int, default=4,
        help="projection LM iterations per blocks sweep (warm-started; "
             "4 matches the converged trajectory of 10 at ~half the cost)",
    )
    p.add_argument("--report", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--state_directory",
        help="resume from a saved state instead of dense initialization",
    )
    p.add_argument(
        "--dense_initialization_base_path",
        help="cache the dense initialization here (.npz): loaded when "
             "present so re-runs skip the init phase, saved after a "
             "fresh init (reference: calibration.cc:948-974)",
    )
    p.add_argument(
        "--localize_only", action="store_true",
        help="freeze intrinsics and pattern points; optimize poses only",
    )
    p.add_argument(
        "--live_directory",
        help="write per-stage visualization PNGs here as calibration "
             "progresses (the headless CalibrationWindow)",
    )
    p.set_defaults(func=cmd_calibrate)

    p = sub.add_parser("extract-features", help="detector only")
    p.add_argument("--image_directories", required=True)
    p.add_argument("--pattern_files", required=True)
    p.add_argument("--output", required=True, help="output dataset.bin")
    p.set_defaults(func=cmd_extract_features)

    p = sub.add_parser(
        "record",
        help="live capture from cameras/videos/directories -> dataset.bin",
    )
    p.add_argument(
        "--inputs", required=True,
        help="comma-separated per-camera sources: v4l2:<index>, "
             "video:<path>, or dir:<path>",
    )
    p.add_argument("--pattern_files", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--record_images", action="store_true",
                   help="write captured images to per-camera directories")
    p.add_argument("--record_all_images", action="store_true",
                   help="record imagesets even without detections")
    p.add_argument("--no_live_detection", action="store_true",
                   help="record only; skip per-frame feature detection")
    p.add_argument("--capture_interval", type=float, default=0.0,
                   help="minimum seconds between processed imagesets")
    p.add_argument("--max_imagesets", type=int, default=None)
    p.add_argument("--show_pattern", action="store_true",
                   help="show the pattern fullscreen on the local display "
                        "for screen-based calibration (reference "
                        "ui/pattern_display.cc); skipped when no display "
                        "is available")
    p.set_defaults(func=cmd_record)

    p = sub.add_parser("report", help="report for a saved state")
    p.add_argument("--state_directory", required=True)
    p.add_argument("--dataset_files", required=True)
    p.add_argument("--output_directory", required=True)
    p.set_defaults(func=cmd_report)

    p = sub.add_parser("create-pattern", help="generate a star pattern")
    p.add_argument("--output_directory", required=True)
    p.add_argument("--squares_x", type=int, default=17)
    p.add_argument("--squares_y", type=int, default=24)
    p.add_argument("--num_star_segments", type=int, default=16)
    p.add_argument("--square_length_in_meters", type=float, default=0.0118)
    p.add_argument("--apriltags", action="store_true", default=True)
    p.add_argument("--first_tag_index", type=int, default=0)
    p.add_argument("--dpi_pixels_per_square", type=int, default=64)
    p.set_defaults(func=cmd_create_pattern)

    p = sub.add_parser("stereo-depth", help="depth estimation on a stereo rig")
    p.add_argument("--state_directory", required=True)
    p.add_argument("--left_image", required=True)
    p.add_argument("--right_image", required=True)
    p.add_argument("--output", required=True, help="output .obj point cloud")
    p.add_argument("--min_depth", type=float, default=0.2)
    p.add_argument("--max_depth", type=float, default=20.0)
    p.add_argument("--num_levels", type=int, default=96)
    p.add_argument("--iterations", type=int, default=8)
    p.add_argument("--algorithm", default="patch_match",
                   choices=["patch_match", "plane_sweep"])
    p.add_argument("--min_component_size", type=int, default=50)
    p.set_defaults(func=cmd_stereo_depth)

    p = sub.add_parser("compare", help="compare two calibrations")
    p.add_argument("state_a")
    p.add_argument("state_b")
    p.set_defaults(func=cmd_compare)

    p = sub.add_parser(
        "compare-reconstructions",
        help="Umeyama-aligned pose + intrinsics comparison of two saved "
             "states (the reference's CompareReconstructions tool)",
    )
    p.add_argument("state_a")
    p.add_argument("state_b")
    p.set_defaults(func=cmd_compare_reconstructions)

    p = sub.add_parser("fit-parametric",
                       help="fit parametric models to a generic calibration")
    p.add_argument("--state_directory", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--camera_index", type=int, default=0)
    p.add_argument("--co_estimate_rotation", action="store_true")
    p.add_argument(
        "--models",
        default="central_thin_prism_fisheye,central_opencv,central_radial",
    )
    p.set_defaults(func=cmd_fit_parametric)

    p = sub.add_parser("visualize-calibration",
                       help="visualize a Kalibr/COLMAP/state calibration")
    p.add_argument("--kalibr_yaml")
    p.add_argument("--colmap_model")
    p.add_argument("--state_directory")
    p.add_argument("--output_directory", required=True)
    p.set_defaults(func=cmd_visualize_calibration)

    p = sub.add_parser("refine-colmap",
                       help="bundle-adjust a COLMAP model")
    p.add_argument("--colmap_model", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--iterations", type=int, default=30)
    p.add_argument("--freeze", default="",
                   help="comma list: poses,points,intrinsics")
    p.set_defaults(func=cmd_refine_colmap)

    p = sub.add_parser("create-legends",
                       help="legend images for the report visualizations")
    p.add_argument("--output_directory", required=True)
    p.add_argument("--max_error_px", type=float, default=1.0)
    p.set_defaults(func=cmd_create_legends)

    p = sub.add_parser("intersect-datasets",
                       help="keep features present in all datasets")
    p.add_argument("dataset_files", nargs="+")
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=1.0)
    p.set_defaults(func=cmd_intersect_datasets)

    p = sub.add_parser("compare-point-clouds",
                       help="align + compare two .obj point clouds")
    p.add_argument("cloud_a")
    p.add_argument("cloud_b")
    p.add_argument("--paired", action="store_true")
    p.set_defaults(func=cmd_compare_point_clouds)

    p = sub.add_parser("convert-dataset", help="dataset.bin <-> JSON")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(func=cmd_convert_dataset)

    p = sub.add_parser("export-colmap", help="export state to a COLMAP model")
    p.add_argument("--state_directory", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--dataset_files")
    p.set_defaults(func=cmd_export_colmap)

    p = sub.add_parser("render-synthetic", help="render a synthetic dataset")
    p.add_argument("--pattern_file", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--num_images", type=int, default=20)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--min_z", type=float, default=0.45)
    p.add_argument("--max_z", type=float, default=0.75)
    p.add_argument("--noise", type=float, default=0.01)
    p.add_argument("--vignetting", type=float, default=0.0,
                   help="radial falloff strength (0-1; ~0.35 is a strong "
                        "lens vignette)")
    p.add_argument("--defocus_sigma", type=float, default=0.0,
                   help="Gaussian PSF sigma in pixels")
    p.add_argument("--jpeg_quality", type=int, default=0,
                   help="round-trip through JPEG at this quality "
                        "(1-99; 0 = lossless PNG only)")
    p.add_argument("--exposure_drift", type=float, default=0.0,
                   help="per-frame random gain/offset amplitude "
                        "(e.g. 0.2 = +/-20% gain)")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=cmd_render_synthetic)

    p = sub.add_parser(
        "localization-accuracy",
        help="Monte-Carlo localization accuracy of a calibration vs GT",
    )
    p.add_argument("--gt_state", required=True)
    p.add_argument("--compared_state", required=True)
    p.add_argument("--camera_index", type=int, default=0)
    p.add_argument(
        "--trials", type=int, default=10000,
        help="Monte-Carlo trials (reference default, "
             "tools/localization_accuracy_test.cc:47)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=cmd_localization_accuracy)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
