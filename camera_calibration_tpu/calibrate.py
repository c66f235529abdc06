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


def _bspline_axis_weights_np(g, size):
    """(N, size) cubic uniform B-spline weight rows, host NumPy.

    Mirror of ops/bspline.dense_axis_weights for the host-side resample
    solves (validated end-to-end against the jnp evaluation in
    tests/test_calibrate.py::test_resample_is_near_exact).
    """
    g = np.asarray(g, np.float64)
    base = np.clip(np.floor(g).astype(int) - 1, 0, size - 4)
    t = g - (base + 1)
    t2, t3 = t * t, t * t * t
    w0 = (1 - 3 * t + 3 * t2 - t3) / 6.0
    w1 = (4 - 6 * t2 + 3 * t3) / 6.0
    w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0
    w3 = t3 / 6.0
    weights = np.zeros((g.size, size))
    idx = np.arange(g.size)
    for k, wk in enumerate((w0, w1, w2, w3)):
        weights[idx, base + k] = wk
    return weights


def _linear_grid_resample(grid_old, new_hw, *, normalize_samples,
                          normalize_knots, samples_per_cell=3):
    """Solve new spline knots reproducing an old spline surface, exactly.

    Model→model grid resampling is LINEAR in the new knots: sample the
    old surface on a product grid covering the shared calibrated area,
    then solve the separable least-squares system
    ``G = (WyᵀWy)⁻¹ Wyᵀ D Wx (WxᵀWx)⁻¹`` per channel.  This replaces the
    iterative dense-model refit the reference reuses here (the refit
    exists for fitting noisy *data*; for resampling, the target IS a
    spline surface, so the LSQ solution is essentially exact) — measured
    ~15 ms and 3e-6 deg median direction error vs the old model, against
    ~13 s and 7e-2 deg for the 20-iteration LM refit it replaces.
    (reference: calibration.cc:373-472 ResampleModel)

    grid_old: (gh, gw, C) np/jnp array; new_hw: (ry, rx).
    normalize_samples: normalize sampled rows to unit length (direction
    surfaces — matches what the model's unproject emits);
    normalize_knots: renormalize the solved knots (direction grids keep
    unit knots for the manifold parametrization).
    """
    ry, rx = new_hw
    grid_old = np.asarray(grid_old, np.float64)
    gh_o, gw_o = grid_old.shape[:2]
    channels = grid_old.shape[2]
    nx = max(samples_per_cell * rx, rx + 4)
    ny = max(samples_per_cell * ry, ry + 4)
    # normalized sample coordinates u ∈ (0, 1) over the calibrated
    # extent; both grids map pixel→grid affinely over the same extent
    # (central_grid.h:148-154), so only u matters.
    ux = (np.arange(nx) + 0.5) / nx
    uy = (np.arange(ny) + 0.5) / ny
    wx_o = _bspline_axis_weights_np(1.0 + (gw_o - 3.0) * ux, gw_o)
    wy_o = _bspline_axis_weights_np(1.0 + (gh_o - 3.0) * uy, gh_o)
    dense = np.einsum("yk,kjc,xj->yxc", wy_o, grid_old, wx_o)
    if normalize_samples:
        dense /= np.maximum(
            np.linalg.norm(dense, axis=-1, keepdims=True), 1e-12
        )
    wx = _bspline_axis_weights_np(1.0 + (rx - 3.0) * ux, rx)
    wy = _bspline_axis_weights_np(1.0 + (ry - 3.0) * uy, ry)
    ay = wy.T @ wy + 1e-9 * np.eye(ry)
    ax = wx.T @ wx + 1e-9 * np.eye(rx)
    g = np.linalg.solve(
        ay, np.einsum("yk,yxc->kxc", wy, dense).reshape(ry, -1)
    ).reshape(ry, nx, channels)
    g = np.linalg.solve(
        ax, np.einsum("xj,kxc->jkc", wx, g).reshape(rx, -1)
    ).reshape(rx, ry, channels).transpose(1, 0, 2)
    if normalize_knots:
        g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    return g


def resample_central_generic(model: cg.CentralGenericModel, new_resolution,
                             samples_per_cell: int = 3):
    """Resample a CentralGeneric grid model to a new resolution.

    (reference: calibration.cc:429-472 ResampleModel CentralGeneric path;
    see _linear_grid_resample for why this is a direct linear solve here
    rather than the reference's iterative FitToDenseModel.)
    """
    grid = _linear_grid_resample(
        model.grid, (new_resolution[1], new_resolution[0]),
        normalize_samples=True, normalize_knots=True,
        samples_per_cell=samples_per_cell,
    )
    return cg.CentralGenericModel(
        grid=jnp.asarray(grid, model.grid.dtype),
        width=model.width,
        height=model.height,
        calibration_min_x=model.calibration_min_x,
        calibration_min_y=model.calibration_min_y,
        calibration_max_x=model.calibration_max_x,
        calibration_max_y=model.calibration_max_y,
    )


def resample_noncentral_generic(model, new_resolution,
                                samples_per_cell: int = 3):
    """Resample a NoncentralGeneric model to a new resolution.

    The reference's NoncentralGeneric→NoncentralGeneric special case
    bilinearly interpolates BOTH grids at the new knot positions
    ("will not fit perfectly, but should be fine as an initial state",
    calibration.cc:385-421).  Here both grids go through the same exact
    linear spline resample as the central path — same-or-better initial
    state for the next pyramid level's BA: the direction grid is
    resampled from the normalized direction surface (unit knots for the
    2-DoF manifold), the point grid from the raw point surface.
    """
    from camera_calibration_tpu.models import noncentral_generic as ncg

    hw = (new_resolution[1], new_resolution[0])
    dir_grid = _linear_grid_resample(
        model.direction_grid, hw,
        normalize_samples=True, normalize_knots=True,
        samples_per_cell=samples_per_cell,
    )
    point_grid = _linear_grid_resample(
        model.point_grid, hw,
        normalize_samples=False, normalize_knots=False,
        samples_per_cell=samples_per_cell,
    )
    dtype = model.direction_grid.dtype
    return ncg.NoncentralGenericModel(
        direction_grid=jnp.asarray(dir_grid, dtype),
        point_grid=jnp.asarray(point_grid, dtype),
        width=model.width,
        height=model.height,
        calibration_min_x=model.calibration_min_x,
        calibration_min_y=model.calibration_min_y,
        calibration_max_x=model.calibration_max_x,
        calibration_max_y=model.calibration_max_y,
    )


def resample_grid_model(model, new_resolution, **kw):
    """Resolution resample for any grid model (central or noncentral)."""
    from camera_calibration_tpu.models import noncentral_generic as ncg

    if isinstance(model, ncg.NoncentralGenericModel):
        return resample_noncentral_generic(model, new_resolution, **kw)
    return resample_central_generic(model, new_resolution, **kw)


def model_kind_of(model) -> str:
    """CLI model-kind string for a model instance."""
    from camera_calibration_tpu.models import noncentral_generic as ncg
    from camera_calibration_tpu.models import parametric as pm

    if isinstance(model, ncg.NoncentralGenericModel):
        return "noncentral_generic"
    if isinstance(model, cg.CentralGenericModel):
        return "central_generic"
    if isinstance(model, pm.CentralThinPrismFisheyeModel):
        return "central_thin_prism_fisheye"
    if isinstance(model, pm.CentralOpenCVModel):
        return "central_opencv"
    if isinstance(model, pm.CentralRadialModel):
        return "central_radial"
    return type(model).__name__


def convert_model(model, target_kind, target_resolution, dtype=None):
    """Convert a camera model to a different kind (and/or resolution).

    The general arm of the reference's ResampleModel
    (calibration.cc:424-525): unproject the source model densely over
    its calibrated area, then fit the target model to the dense
    direction image.  Noncentral sources convert only to noncentral
    targets (same reference restriction, calibration.cc:424-427).
    Returns (new_model, rotation_quat_or_None) — parametric fits
    co-estimate a rotation that the caller must fold into cam_T_rig
    (calibration.cc:497-503); grid targets return None.
    """
    from camera_calibration_tpu.models import noncentral_generic as ncg
    from camera_calibration_tpu.models import parametric as pm
    from camera_calibration_tpu.models.fit import fit_central_generic_to_dense

    source_kind = model_kind_of(model)
    dtype = dtype or (
        model.grid.dtype if hasattr(model, "grid")
        else model.direction_grid.dtype if hasattr(model, "direction_grid")
        else model.params.dtype
    )
    if source_kind == target_kind and source_kind in (
        "central_generic", "noncentral_generic",
    ):
        return resample_grid_model(model, target_resolution), None
    if source_kind == "noncentral_generic":
        raise ValueError(
            "a NoncentralGeneric model can only be resampled to "
            "NoncentralGeneric (reference calibration.cc:424-427)"
        )

    # dense direction image over the calibrated area (≤300 samples/axis,
    # reference kMaxXSamplesForFitting)
    min_x = getattr(model, "calibration_min_x", 0)
    min_y = getattr(model, "calibration_min_y", 0)
    max_x = getattr(model, "calibration_max_x", model.width - 1)
    max_y = getattr(model, "calibration_max_y", model.height - 1)
    w = max_x + 1 - min_x
    h = max_y + 1 - min_y
    step = max(1, int(round(min(w / 300.0, h / 300.0))))
    xs = np.arange(min_x, max_x + 1, step) + 0.5
    ys = np.arange(min_y, max_y + 1, step) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    pixel_coords = np.stack([gx, gy], -1)
    px = jnp.asarray(pixel_coords.reshape(-1, 2), dtype)
    dirs, valid = protocol.unproject(model, px)
    dense = np.asarray(dirs).reshape(len(ys), len(xs), 3)
    vmask = np.asarray(valid).reshape(len(ys), len(xs))

    if target_kind in ("central_generic", "noncentral_generic"):
        rx, ry = target_resolution
        fitted = fit_central_generic_to_dense(
            dense, vmask, (ry, rx),
            width=len(xs), height=len(ys),
            calibration_min_x=0, calibration_min_y=0,
            calibration_max_x=len(xs) - 1, calibration_max_y=len(ys) - 1,
            dtype=dtype,
        )
        central = cg.CentralGenericModel(
            grid=fitted.grid,
            width=model.width, height=model.height,
            calibration_min_x=min_x, calibration_min_y=min_y,
            calibration_max_x=max_x, calibration_max_y=max_y,
        )
        if target_kind == "noncentral_generic":
            # zero point grid = the reference's
            # InitializeFromCentralGenericModel (calibration.cc:459-466)
            return ncg.from_central(central), None
        return central, None

    # parametric targets: fit in the subsampled raster with the true
    # pixel coordinates, co-estimating the alignment rotation
    if target_kind == "central_thin_prism_fisheye":
        template = pm.CentralThinPrismFisheyeModel(
            params=jnp.zeros(12, dtype), width=model.width,
            height=model.height, use_equidistant_projection=True,
        )
    elif target_kind == "central_opencv":
        template = pm.CentralOpenCVModel(
            params=jnp.zeros(12, dtype), width=model.width,
            height=model.height,
        )
    elif target_kind == "central_radial":
        template = pm.CentralRadialModel(
            params=jnp.zeros(8 + 50, dtype), width=model.width,
            height=model.height,
        )
    else:
        raise ValueError(f"unknown target model kind {target_kind}")
    fitted, quat = pm.fit_parametric_to_dense(
        template, dense, vmask, dtype=dtype, co_estimate_rotation=True,
        pixel_coords=pixel_coords,
    )
    return fitted, quat


def resample_models_if_necessary(state: BAState, model_kind: str,
                                 approx_pixels_per_cell: int,
                                 pyramid_level: int, log=print):
    """Resample/convert loaded models when the request differs.

    The reference's resume-time policy (calibration.cc:571-612
    ResampleModelsIfNecessary, called from Calibrate() at :999): for
    each camera, compute the desired grid resolution at the coarsest
    requested pyramid level; when the loaded grid resolution or the
    loaded model type differs from the request, resample/convert.
    Returns the (possibly updated) state.
    """
    from camera_calibration_tpu.ops import se3

    new_intr = list(state.intrinsics)
    cam_q = np.array(state.cam_q_rig)  # writable copy
    cam_changed = False
    changed = False
    for ci, model in enumerate(state.intrinsics):
        min_x = getattr(model, "calibration_min_x", 0)
        min_y = getattr(model, "calibration_min_y", 0)
        max_x = getattr(model, "calibration_max_x", model.width - 1)
        max_y = getattr(model, "calibration_max_y", model.height - 1)
        full = compute_grid_resolution(
            max_x + 1 - min_x, max_y + 1 - min_y, approx_pixels_per_cell
        )
        rx, ry = grid_resolution_for_level(pyramid_level, *full)
        rx, ry = max(4, rx), max(4, ry)
        cur_kind = model_kind_of(model)
        cur_res = None
        if protocol.is_grid_model(model):
            g = getattr(model, "grid", None)
            if g is None:
                g = model.direction_grid
            cur_res = (g.shape[1], g.shape[0])
        if cur_kind == model_kind and (
            cur_res is None or cur_res == (rx, ry)
        ):
            continue
        log(
            f"[calibrate] resampling camera {ci}: {cur_kind}"
            f"{cur_res or ''} -> {model_kind} ({rx}x{ry})"
        )
        new_model, quat = convert_model(model, model_kind, (rx, ry))
        new_intr[ci] = new_model
        if quat is not None:
            # parametric_tr_dense rotation folds into cam_T_rig
            # (calibration.cc:497-503)
            cam_q[ci] = np.asarray(
                se3.quat_mul(jnp.asarray(quat, cam_q.dtype),
                             jnp.asarray(cam_q[ci]))
            )
            cam_changed = True
        changed = True
    if not changed:
        return state
    return BAState(
        rig_q_global=state.rig_q_global,
        rig_t_global=state.rig_t_global,
        cam_q_rig=(jnp.asarray(cam_q, state.cam_q_rig.dtype)
                   if cam_changed else state.cam_q_rig),
        cam_t_rig=state.cam_t_rig,
        points=state.points,
        intrinsics=tuple(new_intr),
    )


import functools

import jax


@functools.partial(jax.jit, static_argnums=2)
def _reproj_errors_jit(state, seg, ci):
    x_cam, _ = transform_to_camera(
        state, seg.imageset, seg.camera, state.points[seg.point]
    )
    px, _, pvalid = protocol.project_points(
        state.intrinsics[ci], x_cam, init_xy=seg.pixel, max_iterations=30
    )
    e = jnp.linalg.norm(px - seg.pixel, axis=-1)
    return jnp.where(pvalid & seg.valid, e, jnp.inf)


def observation_reprojection_errors(state: BAState, data):
    """Per-camera arrays of reprojection error magnitudes (inf = invalid).

    One jitted program per camera, pinned to the local CPU backend: run
    eagerly on the remote accelerator this was ~26 s of op-by-op remote
    dispatches per pipeline (the work itself is milliseconds); as a CPU
    jit it compiles locally once per shape and reruns free for the
    outlier pass, the live visualizer, and the report.
    """
    from camera_calibration_tpu.config import host_device_ctx

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except (RuntimeError, IndexError):
        cpu = None
    errs = []
    # host_device_ctx makes effective_backend() report "cpu" while the
    # projection traces, so the model picks its XLA path (the Pallas
    # kernels only lower for TPU).
    with host_device_ctx():
        for ci, seg in enumerate(data):
            st, sg = state, seg
            if cpu is not None:
                st = jax.device_put(state, cpu)
                sg = jax.device_put(seg, cpu)
            errs.append(_reproj_errors_jit(st, sg, ci))
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
    except (RuntimeError, IndexError):
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


def _ba_options(options, max_iterations, cost_reduction_threshold):
    return lm_pcg.BAOptions(
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


def prewarm_pyramid_executables(state, data, options, full_res=None):
    """Start a daemon thread AOT-preparing the finer pyramid levels' BA
    executables while the coarse levels run.

    Each new grid resolution's LM-step program costs ~3 s of tracing +
    ~10 s of executable load on the remote TPU runtime; serial in the
    pipeline this was most of the BA wall clock (the steps themselves
    take ~0.2 s/level).  Values in the prewarmed state are irrelevant —
    only shapes/dtypes reach the compiler.  Returns the started thread,
    or None when there is nothing to prewarm.
    """
    import threading

    grid_cameras = [
        ci for ci, m in enumerate(state.intrinsics) if protocol.is_grid_model(m)
    ]
    pyramid_levels = (
        0 if "intrinsics" in options.freeze else options.num_pyramid_levels
    )
    if pyramid_levels <= 1 or not grid_cameras:
        return None
    import jax as _jax

    # The latency worth hiding is the REMOTE runtime's executable
    # load; a local CPU backend compiles at first call anyway, and
    # background compiles would only contend with the host pipeline
    # (and every CPU-forced test) for cores.
    if _jax.default_backend() == "cpu":
        return None

    for seg in data:  # sharded tables choose their own layout; skip
        for leaf in _jax.tree_util.tree_leaves(seg):
            if hasattr(leaf, "devices") and len(leaf.devices()) > 1:
                return None
    if full_res is None:
        full_res = {}
        for ci in grid_cameras:
            m = state.intrinsics[ci]
            full_res[ci] = compute_grid_resolution(
                m.calibration_max_x + 1 - m.calibration_min_x,
                m.calibration_max_y + 1 - m.calibration_min_y,
                options.approx_pixels_per_cell,
            )
    state0 = state
    ba_opts = _ba_options(options, options.pyramid_iterations[0], 1e-4)

    def run():
        for level in range(pyramid_levels - 2, -1, -1):
            try:
                intr = list(state0.intrinsics)
                for ci in grid_cameras:
                    rx, ry = grid_resolution_for_level(level, *full_res[ci])
                    intr[ci] = resample_grid_model(intr[ci], (rx, ry))
                st = BAState(
                    rig_q_global=state0.rig_q_global,
                    rig_t_global=state0.rig_t_global,
                    cam_q_rig=state0.cam_q_rig,
                    cam_t_rig=state0.cam_t_rig,
                    points=state0.points,
                    intrinsics=tuple(intr),
                )
                lm_pcg.prewarm(st, data, ba_opts)
            except Exception:  # prewarming is only ever an optimization
                pass

    t = threading.Thread(target=run, daemon=True, name="cctpu-ba-prewarm")
    t.start()
    return t


def run_ba(state, data, max_iterations, cost_reduction_threshold, options,
           callback=None, state_saver=None):
    ba_opts = _ba_options(options, max_iterations, cost_reduction_threshold)

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
    """Full calibration from an initialized state.

    state.intrinsics must already be at the *coarsest* pyramid resolution
    (use init_state_for_pyramid); data = per-camera observation tables.
    Returns (state, report dict).

    state_output_path: if set, the BA state is checkpointed there after
    every accepted LM iteration (reference: calibration.cc:242-245) so a
    crashed run resumes via --state_directory.

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
    prewarm_pyramid_executables(state, data, options, full_res=full_res)
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
        # Upsample grid models (central AND noncentral, reference:
        # calibration.cc:1050-1094) to the next level's resolution.
        new_intr = list(state.intrinsics)
        for ci in grid_cameras:
            rx, ry = grid_resolution_for_level(level - 1, *full_res[ci])
            new_intr[ci] = resample_grid_model(state.intrinsics[ci], (rx, ry))
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
