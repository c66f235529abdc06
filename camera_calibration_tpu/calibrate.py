"""Calibration pipeline orchestration: pyramid BA, outliers, metric scale.

The equivalent of the reference's Calibrate() flow (reference:
applications/camera_calibration/src/camera_calibration/calibration.cc:918-1140):

1. pyramid loop over grid resolutions (factor 1.333 per level,
   calibration.cc:565-568): BA 10 iters @ threshold 1e-4 then 50 @ 1,
   then upsample the grid model by resampling (calibration.cc:373-…);
2. outlier phase: BA, then per-camera IQR-based outlier deletion
   (Q3 + factor·IQR, calibration.cc:104-107);
3. final BA (100 iters @ 1e-4);
4. metric scaling from known pattern-cell lengths via the log-mean
   neighbor-distance ratio (calibration.cc:307-370).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.ba import lm_pcg
from camera_calibration_tpu.ba.dataset import ObservationTable
from camera_calibration_tpu.ba.state import BAState, scale_state, transform_to_camera
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import protocol
from camera_calibration_tpu.models.fit import fit_central_generic_to_dense


@dataclasses.dataclass
class CalibrateOptions:
    num_pyramid_levels: int = 3
    approx_pixels_per_cell: int = 25
    outlier_removal_factor: float = 8.0  # reference CLI default
    final_iterations: int = 100
    pyramid_iterations: tuple = (10, 50)
    max_pcg_iterations: int = 50
    huber_px: float = 1.0
    # freeze groups ("points", "intrinsics", ...): the reference's
    # --localize_only is freeze=("points", "intrinsics")
    freeze: tuple = ()
    # LM iterations fused per device call (lax.scan). 1 = reference-parity
    # per-iteration checkpoint/callback granularity; >1 amortizes the
    # remote-dispatch latency (~30 ms/call) and coarsens checkpoints to
    # every k-th accepted iteration.
    lm_steps_per_call: int = 1
    # Warm-start each PCG solve from the previous accepted LM step
    # (effective with lm_steps_per_call > 1).  Measured on the 262k-obs
    # bench: same iteration rate, ~9x lower cost after 30 iterations —
    # the capped CG solves keep refining the same Krylov direction
    # across LM iterations.  Off by default for reference-trajectory
    # parity in the early (pyramid) iterations.
    cg_warm_start: bool = False
    # Per-sweep projection LM iteration cap.  Projections are warm-started
    # from the previous iteration's pixels, so 4 matches the converged
    # trajectory of 10 on calibration-shaped problems while cutting the
    # dominant blocks-pass cost (measured: identical cost trajectory
    # through 30 iterations on the 262k-obs bench).
    proj_iterations: int = 4
    # Solver mode — the user surface for the reference's --schur_mode
    # family (Readme.md:330-352).  See BAOptions.solver for the five
    # modes; "schur_direct" (exact reduced Newton step) wins
    # time-to-convergence on small/medium problems, the Schur-PCG
    # default wins at scale.
    solver: str = "auto"
    # Memory-bounded streaming: evaluate residual/Jacobian blocks in
    # lax.map chunks of this many observations — the analog of the
    # reference's on-the-fly SchurModes (lm_optimizer.h:297-307).
    block_chunk: int | None = None
    # Mixed-precision polish: after the (fast, f32-on-chip) pipeline,
    # run this many LM iterations in float64 on the host CPU to secure
    # the final RMSE — the reference follows its f32 CUDA BA with 10
    # CPU f64 iterations (calibration.cc:1127-1133).  0 disables; no-op
    # when the state is already float64.
    polish_iterations: int = 0


def compute_grid_resolution(calib_w, calib_h, approx_pixels_per_cell,
                            exterior_cells_per_side=1):
    """(reference: calibration.cc:531-541 ComputeGridResolution)"""
    rx = int(calib_w / approx_pixels_per_cell + 0.5) + 2 * exterior_cells_per_side
    ry = int(calib_h / approx_pixels_per_cell + 0.5) + 2 * exterior_cells_per_side
    return rx, ry


def grid_resolution_for_level(level, full_x, full_y):
    """(reference: calibration.cc:565-568 CalcGridResolutionForLevel)"""
    return (
        int(full_x * math.pow(1.333, -level) + 0.5),
        int(full_y * math.pow(1.333, -level) + 0.5),
    )


def resample_central_generic(model: cg.CentralGenericModel, new_resolution,
                             samples_per_axis: int = 200):
    """Resample a grid model to a new resolution.

    Evaluates the old model's unprojection over the calibrated area and fits
    a fresh grid (reference: calibration.cc:373-…, dense-model refit path).
    """
    w = model.calibration_max_x + 1 - model.calibration_min_x
    h = model.calibration_max_y + 1 - model.calibration_min_y
    sx = max(1, w // samples_per_axis)
    sy = max(1, h // samples_per_axis)
    xs = np.arange(model.calibration_min_x, model.calibration_max_x + 1, sx) + 0.5
    ys = np.arange(model.calibration_min_y, model.calibration_max_y + 1, sy) + 0.5
    xx, yy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2), model.grid.dtype)
    dirs, valid = cg.unproject(model, px)
    dense = np.asarray(dirs).reshape(len(ys), len(xs), 3)
    vmask = np.asarray(valid).reshape(len(ys), len(xs))

    # Fit in the subsampled pixel space, then rewrap with original bounds.
    sub = fit_central_generic_to_dense(
        dense,
        vmask,
        (new_resolution[1], new_resolution[0]),
        width=len(xs),
        height=len(ys),
        calibration_min_x=0,
        calibration_min_y=0,
        calibration_max_x=len(xs) - 1,
        calibration_max_y=len(ys) - 1,
        max_iterations=20,
        dtype=model.grid.dtype,
    )
    return cg.CentralGenericModel(
        grid=sub.grid,
        width=model.width,
        height=model.height,
        calibration_min_x=model.calibration_min_x,
        calibration_min_y=model.calibration_min_y,
        calibration_max_x=model.calibration_max_x,
        calibration_max_y=model.calibration_max_y,
    )


def observation_reprojection_errors(state: BAState, data):
    """Per-camera arrays of reprojection error magnitudes (inf = invalid)."""
    errs = []
    for ci, seg in enumerate(data):
        x_cam, _ = transform_to_camera(
            state, seg.imageset, seg.camera, state.points[seg.point]
        )
        px, _, pvalid = protocol.project_points(
            state.intrinsics[ci], x_cam, init_xy=seg.pixel, max_iterations=30
        )
        e = jnp.linalg.norm(px - seg.pixel, axis=-1)
        errs.append(jnp.where(pvalid & seg.valid, e, jnp.inf))
    return errs


def delete_outlier_features(state: BAState, data, factor: float):
    """Invalidate observations beyond Q3 + factor·IQR, per camera.

    (reference: calibration.cc:62-120 DeleteOutlierFeatures)
    Returns (new data, number removed).
    """
    errs = observation_reprojection_errors(state, data)
    new_data = []
    removed = 0
    for seg, e in zip(data, errs):
        e_np = np.asarray(e)
        finite = np.isfinite(e_np) & np.asarray(seg.valid)
        if finite.sum() < 8:  # reference's arbitrary minimum
            new_data.append(seg)
            continue
        vals = np.sort(e_np[finite])
        q1 = vals[min(len(vals) - 1, int(0.25 * len(vals) + 0.5))]
        q3 = vals[min(len(vals) - 1, int(0.75 * len(vals) + 0.5))]
        thresh = q3 + factor * (q3 - q1)
        keep = finite & (e_np <= thresh)
        removed += int(finite.sum() - keep.sum())
        new_data.append(
            ObservationTable(
                imageset=seg.imageset,
                camera=seg.camera,
                point=seg.point,
                pixel=seg.pixel,
                valid=jnp.asarray(keep),
            )
        )
    return tuple(new_data), removed


def scale_to_metric(state: BAState, known_geometries, feature_id_to_point_index):
    """Metric scale from known pattern-cell lengths.

    (reference: calibration.cc:307-370 ScaleToMetric) — log-mean of
    ideal/actual distances of axis-aligned neighbor corners.
    """
    pts = np.asarray(state.points)
    log_sum = 0.0
    count = 0
    for geom in known_geometries:
        pos_to_index = {}
        for fid, pos in geom.feature_id_to_position.items():
            if fid in feature_id_to_point_index:
                pos_to_index[tuple(pos)] = feature_id_to_point_index[fid]
        for pos, idx in pos_to_index.items():
            for dx, dy in ((1, 0), (0, 1)):
                nb = (pos[0] + dx, pos[1] + dy)
                if nb not in pos_to_index:
                    continue
                actual = np.linalg.norm(pts[idx] - pts[pos_to_index[nb]])
                if actual <= 0:
                    continue
                log_sum += math.log(geom.cell_length_in_meters / actual)
                count += 1
    if count == 0:
        return state, 1.0
    factor = math.exp(log_sum / count)
    return scale_state(state, factor), factor


def cast_floating(tree, dtype, device=None):
    """Cast every floating-point leaf of a pytree (e.g. BAState or
    observation tables) to ``dtype``, optionally committing to ``device``.
    Integer index arrays and static metadata are untouched."""
    import jax

    def cast(x):
        x = jnp.asarray(x)
        # move FIRST: widening to f64 must not execute on an accelerator
        # that lacks 64-bit support (the TPU compiler rejects f64).
        if device is not None:
            x = jax.device_put(x, device)
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


class float64_cpu_scope:
    """Scoped jax_enable_x64 + CPU default device.

    The f64 polish needs both global JAX flags flipped: x64 enabled (so
    float64 staging works) and the default device pinned to the CPU
    backend (TPU runtimes fatally reject 64-bit layouts, and with x64
    enabled even index staging produces int64).  Both flags are global
    and sticky — a *library* caller must get its process back, so this
    context manager snapshots and restores them (the reference's polish
    is likewise a local solver call, calibration.cc:1127-1133).
    """

    def __enter__(self):
        import jax

        self._active = False
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except (RuntimeError, IndexError):
            # no CPU backend (e.g. JAX_PLATFORMS=tpu): the f64 polish is
            # skipped in this configuration, so the scope degrades to a
            # no-op instead of crashing post-calibration save/report
            return None
        self._prev_x64 = bool(jax.config.jax_enable_x64)
        self._prev_dev = jax.config.jax_default_device
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_default_device", cpu)
        self._active = True
        return cpu

    def __exit__(self, *exc):
        import jax

        if self._active:
            jax.config.update("jax_enable_x64", self._prev_x64)
            jax.config.update("jax_default_device", self._prev_dev)
        return False


def polish_float64(state, data, options: CalibrateOptions,
                   callback=None, state_saver=None, log=print):
    """Float64 CPU polish of a float32 calibration.

    The TPU path runs in float32 (f32 is the chip's native precision and
    what the Pallas kernels require); like the reference's f32 CUDA BA,
    it is followed by a few float64 LM iterations on the host CPU to
    secure the final RMSE (reference: calibration.cc:1127-1133 runs 10
    CPU iterations at threshold 1e-4 after the CUDA pass).

    The x64/CPU-default config flip is *scoped* (float64_cpu_scope): on
    return the process-global JAX config is exactly as before, so a
    subsequent plain-f32 optimize() in the same process still runs on
    the default accelerator backend.  The returned float64 arrays are
    committed to the CPU device, so later computations that touch them
    (report metrics, serialization) execute on the CPU backend via
    JAX's committed-device propagation without any global flag.
    Returns (state64, data64, info) — float64 for saving/report; data64
    is the observation tables cast to f64 (valid masks untouched).
    """
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        log("[calibrate] no CPU backend available; skipping f64 polish")
        return state, data, None
    with float64_cpu_scope():
        state64 = cast_floating(state, jnp.float64, device=cpu)
        if state64.points.dtype != jnp.float64:
            log("[calibrate] float64 unavailable; skipping polish")
            return state, data, None
        data64 = cast_floating(data, jnp.float64, device=cpu)
        with jax.default_device(cpu):
            state64, info = run_ba(
                state64, data64, options.polish_iterations, 1e-4, options,
                callback=callback, state_saver=state_saver,
            )
    return state64, data64, info


def run_ba(state, data, max_iterations, cost_reduction_threshold, options,
           callback=None, state_saver=None):
    ba_opts = lm_pcg.BAOptions(
        max_lm_iterations=max_iterations,
        max_pcg_iterations=options.max_pcg_iterations,
        huber_px=options.huber_px,
        cost_reduction_threshold=cost_reduction_threshold,
        freeze=tuple(options.freeze),
        lm_steps_per_call=max(1, int(options.lm_steps_per_call)),
        cg_warm_start=options.cg_warm_start,
        proj_iterations=options.proj_iterations,
        solver=options.solver,
        block_chunk=options.block_chunk,
    )

    def cb(entry, st):
        if callback is not None:
            callback(entry, st)
        # checkpoint after every accepted iteration (the reference saves
        # the BA state each iteration, calibration.cc:242-245)
        if state_saver is not None and entry["accepted"]:
            state_saver(st)

    return lm_pcg.optimize(state, None, None, ba_opts, data=data, callback=cb)


def calibrate(
    state: BAState,
    data,
    options: CalibrateOptions = CalibrateOptions(),
    *,
    known_geometries=None,
    feature_id_to_point_index=None,
    log=print,
    state_output_path=None,
    image_used=None,
    visualizer=None,
):
    """state_output_path: if set, the BA state is checkpointed there after
    every accepted LM iteration (reference: calibration.cc:242-245) so a
    crashed run resumes via --state_directory."""
    """Full calibration from an initialized state.

    state.intrinsics must already be at the *coarsest* pyramid resolution
    (use init_state_for_pyramid); data = per-camera observation tables.
    Returns (state, report dict).

    visualizer: optional ui.calibration_visualizer.CalibrationVisualizer;
    its per-stage hooks are invoked as the pipeline progresses, mirroring
    how the reference's Calibrate() drives its CalibrationWindow after
    each BA iteration (calibration.cc:256-290).
    """
    report = {"pyramid": [], "outliers_removed": 0, "scale_factor": 1.0}

    vis_callback = None
    if visualizer is not None:
        # closes over ``data``, which is rebound after outlier removal
        def vis_callback(entry, st):
            if entry["accepted"]:
                visualizer.update_reprojection_errors(
                    st, data, iteration=entry["iteration"]
                )

    state_saver = None
    if state_output_path is not None and feature_id_to_point_index is not None:
        from camera_calibration_tpu.io import state_io

        def state_saver(st):
            # Persist the real image_used set: never-localized imagesets
            # still carry identity rig poses, and recording them as used
            # would inject gross outliers on --state_directory resume
            # (the reference's SaveBAState persists the same set).
            used = (
                list(image_used) if image_used is not None
                else [True] * st.rig_q_global.shape[0]
            )
            state_io.save_ba_state(
                state_output_path, st, used, feature_id_to_point_index
            )

    grid_cameras = [
        ci for ci, m in enumerate(state.intrinsics) if protocol.is_grid_model(m)
    ]
    full_res = {}
    for ci in grid_cameras:
        m = state.intrinsics[ci]
        full_res[ci] = compute_grid_resolution(
            m.calibration_max_x + 1 - m.calibration_min_x,
            m.calibration_max_y + 1 - m.calibration_min_y,
            options.approx_pixels_per_cell,
        )

    # reference: pyramid loop only runs when intrinsics are optimized
    # (calibration.cc:1050 "pyramid_level > 0 && !localize_only")
    pyramid_levels = (
        0 if "intrinsics" in options.freeze else options.num_pyramid_levels
    )
    for level in range(pyramid_levels - 1, 0, -1):
        log(f"[calibrate] pyramid level {level}")
        state, info1 = run_ba(
            state, data, options.pyramid_iterations[0], 1e-4, options,
            callback=vis_callback, state_saver=state_saver,
        )
        state, info2 = run_ba(
            state, data, options.pyramid_iterations[1], 1.0, options,
            callback=vis_callback, state_saver=state_saver,
        )
        report["pyramid"].append(
            {"level": level, "cost": info2["final_cost"] or info1["final_cost"]}
        )
        # Upsample grid models to the next level's resolution.
        new_intr = list(state.intrinsics)
        for ci in grid_cameras:
            rx, ry = grid_resolution_for_level(level - 1, *full_res[ci])
            new_intr[ci] = resample_central_generic(state.intrinsics[ci], (rx, ry))
        state = BAState(
            rig_q_global=state.rig_q_global,
            rig_t_global=state.rig_t_global,
            cam_q_rig=state.cam_q_rig,
            cam_t_rig=state.cam_t_rig,
            points=state.points,
            intrinsics=tuple(new_intr),
        )

    if options.outlier_removal_factor > 0:
        iters = (
            options.final_iterations
            if options.num_pyramid_levels == 1
            else options.pyramid_iterations[0]
        )
        state, _ = run_ba(state, data, iters, 1e-4, options,
                          callback=vis_callback, state_saver=state_saver)
        data, removed = delete_outlier_features(
            state, data, options.outlier_removal_factor
        )
        report["outliers_removed"] = removed
        log(f"[calibrate] removed {removed} outlier observations")
        if visualizer is not None:
            visualizer.update_removed_outliers(state, data, removed)

    state, info = run_ba(state, data, options.final_iterations, 1e-4, options,
                         callback=vis_callback, state_saver=state_saver)
    report["final_cost"] = info["final_cost"]
    solver_report = info.get("report")
    if solver_report is not None:
        report["solver"] = solver_report.as_dict()
        log(
            "[calibrate] final BA: "
            f"{solver_report.iterations} iters "
            f"({solver_report.accepted} accepted), "
            f"cost {solver_report.initial_cost:.4g} -> "
            f"{solver_report.final_cost:.4g}, "
            f"{solver_report.step_seconds:.2f}s steps "
            f"+ {solver_report.first_call_seconds:.2f}s first call"
        )

    # mixed-precision mode: f64 CPU polish after the f32-on-chip phases
    # (reference: calibration.cc:1127-1133).  The x64/CPU-device config
    # flip is scoped to this call: the tail (metric scale, report
    # metrics) runs inside the scope so the f64 arrays are not truncated
    # by x64-off staging, and the scope restores the process-global
    # config before calibrate() returns.
    from contextlib import ExitStack

    with ExitStack() as stack:
        if (options.polish_iterations > 0
                and state.points.dtype == jnp.float32):
            state, data, pinfo = polish_float64(
                state, data, options,
                callback=vis_callback, state_saver=state_saver, log=log,
            )
            if pinfo is not None:
                stack.enter_context(float64_cpu_scope())
                if pinfo["final_cost"] is not None:
                    report["final_cost_f32"] = report["final_cost"]
                    report["polish_cost"] = pinfo["final_cost"]
                    pre = report["final_cost"]
                    log(
                        f"[calibrate] f64 polish "
                        f"({options.polish_iterations} iters): cost "
                        f"{pre if pre is None else format(pre, '.6g')} -> "
                        f"{pinfo['final_cost']:.6g}"
                    )
                    report["final_cost"] = pinfo["final_cost"]

        # reference skips metric scaling in localize-only mode
        # (calibration.cc:1136-1139)
        if (known_geometries and feature_id_to_point_index
                and "points" not in options.freeze):
            state, factor = scale_to_metric(
                state, known_geometries, feature_id_to_point_index
            )
            report["scale_factor"] = factor
            log(f"[calibrate] metric scale factor {factor:.6f}")

        if visualizer is not None:
            visualizer.update_error_histogram(state, data)
            visualizer.update_error_directions(state, data)
            for ci, m in enumerate(state.intrinsics):
                visualizer.update_observation_directions(ci, m)

        errs = observation_reprojection_errors(state, data)
        all_err = np.concatenate([np.asarray(e) for e in errs])
        all_err = all_err[np.isfinite(all_err)]
        if all_err.size:
            report["reprojection_error_median"] = float(np.median(all_err))
            report["reprojection_error_average"] = float(np.mean(all_err))
            report["reprojection_error_maximum"] = float(np.max(all_err))
    return state, data, report
