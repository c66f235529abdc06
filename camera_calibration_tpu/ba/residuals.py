"""Reprojection residuals and per-observation Jacobian blocks.

The heart of bundle adjustment.  For every observation (imageset i, camera
c, point p, measured pixel m): residual ``r = π_c(R_c (R_r x_p + t_r) + t_c) − m``
with Huber(1.0 px) robustification — semantics matching the reference's
cost function (reference: applications/camera_calibration/src/
camera_calibration/bundle_adjustment/joint_optimization.cc:308-449).

Per-observation Jacobian *blocks* are computed in closed form:
pose/point chains via small cross-product matrices; the intrinsics block is

- for grid models: sparse 4×4-window knot blocks from the
  implicit-function-theorem projection sensitivities
  (models/central_generic.py) — replacing the reference's numeric
  knot-perturbation loop (central_grid.h:188-245);
- for parametric models: dense (2, K) parameter blocks from forward-mode
  AD of the closed-form projection — replacing the reference's
  sympy-generated ProjectionJacobianWrtIntrinsics
  (central_thin_prism_fisheye.h:103-…).

Everything is batched; observations are sorted by camera so each camera's
segment is a static slice (the TPU-native replacement for per-feature
dynamic dispatch).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from camera_calibration_tpu.ba.state import BAState, transform_to_camera
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.models import noncentral_generic as ncg
from camera_calibration_tpu.models import parametric as pm
from camera_calibration_tpu.models import protocol
from camera_calibration_tpu.models.base import replace
from camera_calibration_tpu.ops import losses, manifolds, se3


def _pytree(cls, meta=()):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [
        f.name for f in dataclasses.fields(cls) if f.name not in meta
    ]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )
    return cls


@(lambda c: _pytree(c, meta=("k_tangent",)))
class GridIntr:
    """Sparse intrinsics block for spline-grid models.

    ``j_win`` is stored strictly 2-D, (2·4·4·K, n) with row-major
    [i, y, x, j] rows: any higher-rank form with a small trailing
    dimension invites a lane-padded TPU tiled layout for materialized
    copies (measured: a 34 GB allocation for the logical (n,2,4,4,2)
    cache at 2M observations) — 2-D buffers with one large dimension
    always tile densely.  Consumers reshape in-fusion.  The 0/1
    window-row/column indicators that turn knot gather/scatter into MXU
    contractions are built on the fly from ``base_xy`` at every use (a
    cheap VPU compare), never stored."""

    j_win: jnp.ndarray  # (2*4*4*K, n) window-knot Jacobian, rows [i,y,x,j]
    base_xy: jnp.ndarray  # (n, 2) int32 window base (bx, by)
    k_tangent: int  # K (static): 2 central, 5 noncentral


def _window_onehots(base_xy, gh, gw, dtype):
    """Per-offset 0/1 window indicators as 2-D arrays.

    Returns (oy_list[4] of (n, gh), ox_list[4] of (n, gw)).  Strictly 2-D:
    every higher-rank per-observation tensor with small trailing dims
    risks a lane-padded layout when materialized (the 34 GB failure mode
    documented on GridIntr).
    """
    by = base_xy[:, 1]
    bx = base_xy[:, 0]
    iota_h = jnp.arange(gh, dtype=base_xy.dtype)[None, :]
    iota_w = jnp.arange(gw, dtype=base_xy.dtype)[None, :]
    oy = [(iota_h == (by + y)[:, None]).astype(dtype) for y in range(4)]
    ox = [(iota_w == (bx + x)[:, None]).astype(dtype) for x in range(4)]
    return oy, ox


@_pytree
class DenseIntr:
    """Dense intrinsics block for parametric models."""

    j_params: jnp.ndarray  # (n, 2, K)


@_pytree
class ObsBlocks:
    """Per-observation residuals + Jacobian blocks for one camera segment."""

    r: jnp.ndarray  # (n, 2) residual px - measured
    j_rig: jnp.ndarray  # (n, 2, 6)
    j_cam: jnp.ndarray  # (n, 2, 6)
    j_point: jnp.ndarray  # (n, 2, 3)
    intr: object  # GridIntr | DenseIntr
    weight: jnp.ndarray  # (n,) Huber IRLS weight · validity
    valid: jnp.ndarray  # (n,) bool
    cost: jnp.ndarray  # (n,) robust cost (0 where invalid)


def _cross_matrix(v):
    """[v]_× for (..., 3)."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        axis=-2,
    )


def _bmm(a, b):
    """Per-observation tiny matmul (n, i, k) @ (n, k, l) -> (n, i, l).

    Written as broadcast-multiply + reduce instead of einsum/dot_general:
    XLA:TPU lowers tiny batched dots to base-dilated convolutions
    (EmitAllBatchInSublanes) that cost ~3 ms at 262k observations plus a
    layout-fixing copy; the fused elementwise form is bandwidth-bound
    (~0.1 ms) and keeps the consumer's layout.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _bmv(a, v):
    """Per-observation tiny matvec (n, i, k) @ (n, k) -> (n, i)."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _grid_projection_blocks_pallas(model, x_cam, warm_xy, max_proj_iterations,
                                   frames):
    """Fused-kernel variant of _grid_projection_blocks (TPU hot path).

    One Pallas launch runs the LM projection loop, the IFT sensitivities,
    and the 4x4-window knot-Jacobian assembly grid-resident in VMEM
    (models/central_generic_pallas.py) — the analog of the reference's
    single-pass CUDA Jacobian kernel (cuda_joint_optimization.cu:92-281).
    """
    from camera_calibration_tpu.models import central_generic_pallas as cgp

    n = x_cam.shape[0]
    norm = jnp.linalg.norm(x_cam, axis=-1, keepdims=True)
    d = x_cam / jnp.maximum(norm, 1e-18)
    g0 = cg.pixel_to_grid(model, warm_xy)
    lo, hi = cg._static_clamp_bounds(model)
    eps = 1e-10
    tile = 2048
    n_pad = -(-n // tile) * tile
    center = (0.5 * (lo[0] + hi[0]), 0.5 * (lo[1] + hi[1]))
    dirs_p = cg._pad_rows(d, n_pad, (0.0, 0.0, 1.0))
    g_p = cg._pad_rows(g0, n_pad, center)
    if frames is None:
        frames = manifolds.direction_tangents(model.grid)
    t1, t2 = frames
    sx, sy = cg.pixel_scale_to_grid_scale(model)
    g_star, cost, ppx, _pn, jwin, base = cgp.project_blocks_pallas(
        model.grid, t1, t2, dirs_p, g_p, lo, hi,
        (1.0 / sx, 1.0 / sy),
        max_iterations=int(max_proj_iterations), eps=eps, tile=tile,
    )
    g_star = g_star[:n]
    pvalid = (cost[:n] < 1e4 * eps) & (norm[:, 0] > 1e-12)
    px = cg.grid_to_pixel(model, g_star)
    p = ppx[:, :n].T.reshape(n, 2, 3)  # pix_wrt_dir
    pd = _bmv(p, d)
    a = (p - pd[..., None] * d[:, None, :]) / jnp.maximum(
        norm[..., None], 1e-18
    )
    intr = GridIntr(
        j_win=jwin[:, :n],
        base_xy=base[:, :n].T.astype(jnp.int32),
        k_tangent=2,
    )
    return px, pvalid, a, intr


def _grid_projection_blocks(model, x_cam, warm_xy, max_proj_iterations, frames):
    """Grid-model projection + (px, valid, jac_xcam, GridIntr)."""
    if cg.pallas_projection_enabled(model, x_cam.dtype):
        return _grid_projection_blocks_pallas(
            model, x_cam, warm_xy, max_proj_iterations, frames
        )
    px, g, pvalid = cg.project_points(
        model, x_cam, init_xy=warm_xy, max_iterations=max_proj_iterations
    )
    sens = cg.projection_sensitivities(model, g)
    p = sens["pix_wrt_dir"]  # (n, 2, 3)

    # d = x_cam/|x_cam|; A = P·(I − d dᵀ)/|x_cam|  — wrt x_cam
    norm = jnp.linalg.norm(x_cam, axis=-1, keepdims=True)
    d = x_cam / jnp.maximum(norm, 1e-18)
    pd = _bmv(p, d)
    a = (p - pd[..., None] * d[:, None, :]) / jnp.maximum(norm[..., None], 1e-18)

    if frames is None:
        frames = manifolds.direction_tangents(model.grid)
    t1, t2 = frames
    fr = jnp.stack([t1, t2], axis=-1)  # (Hg, Wg, 3, 2)
    gw = model.grid.shape[1]
    bx = sens["base_xy"][:, 0]
    by = sens["base_xy"][:, 1]
    off = jnp.arange(4, dtype=bx.dtype)
    gx = bx[:, None, None] + off[None, None, :]
    gy = by[:, None, None] + off[None, :, None]
    win_flat = gy * gw + gx  # (n, 4, 4)
    win_frames = fr.reshape(-1, 3, 2)[win_flat]  # (n,4,4,3,2)
    j_win = -jnp.einsum(
        "nyx,nic,nyxcj->iyxjn", sens["weights"], sens["pn"], win_frames
    )
    n = x_cam.shape[0]
    intr = GridIntr(
        j_win=j_win.reshape(-1, n),
        base_xy=jnp.stack([bx, by], axis=-1),
        k_tangent=2,
    )
    return px, pvalid, a, intr


def _parametric_projection_blocks(model, x_cam):
    """Parametric projection + (px, valid, jac_xcam, DenseIntr) via AD."""
    px, _, pvalid = pm.project_points(model, x_cam)

    def f(params, xc):
        m = replace(model, params=params)
        out, _, _ = pm.project_points(m, xc[None])
        return out[0]

    jac_fn = jax.vmap(jax.jacfwd(f, argnums=(0, 1)), in_axes=(None, 0))
    j_params, jac_xcam = jac_fn(model.params, x_cam)
    return px, pvalid, jac_xcam, DenseIntr(j_params=j_params)


def segment_blocks(
    model,
    state: BAState,
    imageset_idx,
    camera_idx,
    point_idx,
    measured_px,
    obs_valid,
    warm_xy,
    *,
    huber_px: float = 1.0,
    max_proj_iterations: int = 10,
    tangent_frames=None,
    grid_shape=None,
):
    """Residuals + all Jacobian blocks for one camera's observations.

    Returns (ObsBlocks, new_warm_xy).
    """
    from camera_calibration_tpu.ba.state import broadcast_rows

    dtype = state.points.dtype
    x = broadcast_rows(state.points, point_idx, grid_shape, 1)
    x_cam, x_rig = transform_to_camera(
        state, imageset_idx, camera_idx, x, grid_shape=grid_shape
    )

    if isinstance(model, ncg.NoncentralGenericModel):
        px, g, pvalid = ncg.project_points(
            model, x_cam, init_xy=warm_xy, max_iterations=max_proj_iterations
        )
        nblocks = ncg.projection_blocks(model, g, x_cam)
        a = nblocks["pix_wrt_x"]
        wf = nblocks["win_flat"]
        gw = model.direction_grid.shape[1]
        n = wf.shape[0]
        intr = GridIntr(
            j_win=jnp.moveaxis(nblocks["j_win"], 0, -1).reshape(-1, n),
            base_xy=jnp.stack(
                [wf[:, 0, 0] % gw, wf[:, 0, 0] // gw], axis=-1
            ),
            k_tangent=5,
        )
    elif protocol.is_grid_model(model):
        px, pvalid, a, intr = _grid_projection_blocks(
            model, x_cam, warm_xy, max_proj_iterations, tangent_frames
        )
    else:
        px, pvalid, a, intr = _parametric_projection_blocks(model, x_cam)

    valid = obs_valid & pvalid

    r_c = se3.quat_to_matrix(state.cam_q_rig[camera_idx])  # (n,3,3)
    r_r = se3.quat_to_matrix(
        broadcast_rows(state.rig_q_global, imageset_idx, grid_shape, 0)
    )
    a_rc = _bmm(a, r_c)  # (n,2,3)

    j_point = _bmm(a_rc, r_r)
    v_r = x_rig - broadcast_rows(
        state.rig_t_global, imageset_idx, grid_shape, 0
    )  # R_r x
    j_rig_rot = -_bmm(a_rc, _cross_matrix(v_r))
    j_rig = jnp.concatenate([j_rig_rot, a_rc], axis=-1)  # (n,2,6)
    v_c = x_cam - state.cam_t_rig[camera_idx]  # R_c x_rig
    j_cam_rot = -_bmm(a, _cross_matrix(v_c))
    j_cam = jnp.concatenate([j_cam_rot, a], axis=-1)

    r = px - measured_px
    r = jnp.where(valid[:, None], r, 0.0)
    sq = jnp.sum(r * r, axis=-1)
    huber = jnp.asarray(huber_px, dtype)
    w = losses.huber_weight(sq, huber) * valid.astype(dtype)
    cost = losses.huber_cost(sq, huber) * valid.astype(dtype)

    mask3 = valid[:, None, None]
    if isinstance(intr, GridIntr):
        intr = GridIntr(
            j_win=jnp.where(valid[None, :], intr.j_win, 0.0),
            base_xy=intr.base_xy,
            k_tangent=intr.k_tangent,
        )
    else:
        intr = DenseIntr(j_params=jnp.where(mask3, intr.j_params, 0.0))

    blocks = ObsBlocks(
        r=r,
        j_rig=jnp.where(mask3, j_rig, 0.0),
        j_cam=jnp.where(mask3, j_cam, 0.0),
        j_point=jnp.where(mask3, j_point, 0.0),
        intr=intr,
        weight=w,
        valid=valid,
        cost=cost,
    )
    new_warm = jnp.where(pvalid[:, None], px, warm_xy)
    return blocks, new_warm


def intr_apply_j(intr, tangent_intr):
    """Intrinsics contribution to J·v: (n, 2)."""
    if isinstance(intr, GridIntr):
        from camera_calibration_tpu.ba import window_pallas as wp

        gh, gw, k = tangent_intr.shape
        n = intr.j_win.shape[-1]
        if wp.window_pallas_enabled(intr.j_win.dtype):
            return wp.window_apply_j(intr.j_win, intr.base_xy, tangent_intr)
        # XLA fallback: upcast bf16 rows so the n-axis reductions
        # accumulate in f32 (the Pallas path upcasts in VMEM)
        j_win = intr.j_win
        if j_win.dtype == jnp.bfloat16:
            j_win = j_win.astype(jnp.float32)
        oy, ox = _window_onehots(intr.base_xy, gh, gw, j_win.dtype)
        # Batched window gather (XLA fallback path; the TPU hot path is
        # the Pallas kernel above): two batched contractions instead of
        # ~50 small 2-D ops.  The op count matters under GSPMD
        # observation sharding — every separate contraction over the
        # sharded axis becomes its own collective — and on the CPU
        # backend, where dispatch dominates.  (On TPU the unrolled 2-D
        # matmul form measured faster than the batched one, which is why
        # the Pallas kernel, not this path, serves the chip.)
        oy_s = jnp.stack(oy)  # (4, n, gh)
        ox_s = jnp.stack(ox)  # (4, n, gw)
        rowsel = jnp.einsum(
            "ynh,hwj->ynwj", oy_s, tangent_intr
        )  # (4, n, gw, k): tangent row at (by+y) per observation
        wv = jnp.einsum("xnw,ynwj->yxjn", ox_s, rowsel)  # (4, 4, k, n)
        wv = wv.reshape(16 * k, n)
        out0 = jnp.sum(j_win[: 16 * k] * wv, axis=0)
        out1 = jnp.sum(j_win[16 * k:] * wv, axis=0)
        return jnp.stack([out0, out1], axis=-1)
    return jnp.einsum("nik,k->ni", intr.j_params, tangent_intr)


def intr_apply_jtw(intr, ws, tangent_shape_like):
    """Intrinsics part of JᵀW·s, scattered into the tangent layout."""
    if isinstance(intr, GridIntr):
        from camera_calibration_tpu.ba import window_pallas as wp

        gh, gw, k = tangent_shape_like.shape
        n = intr.j_win.shape[-1]
        if wp.window_pallas_enabled(intr.j_win.dtype):
            return wp.window_apply_jtw(
                intr.j_win, intr.base_xy, ws, gh, gw, k
            )
        j_win = intr.j_win
        if j_win.dtype == jnp.bfloat16:
            j_win = j_win.astype(jnp.float32)
        oy, ox = _window_onehots(intr.base_xy, gh, gw, j_win.dtype)
        # Batched window scatter (XLA fallback; see intr_apply_j note):
        # ONE contraction over the observation axis — a single collective
        # under observation sharding instead of 16·k — preceded by a
        # batched x-spread that stays shard-local.
        oy_s = jnp.stack(oy)  # (4, n, gh)
        ox_s = jnp.stack(ox)  # (4, n, gw)
        c = (
            j_win[: 16 * k] * ws[:, 0]
            + j_win[16 * k:] * ws[:, 1]
        ).reshape(4, 4, k, n)
        t = jnp.einsum("xnw,yxjn->ynwj", ox_s, c)  # (4, n, gw, k)
        return jnp.einsum("ynh,ynwj->hwj", oy_s, t)
    return jnp.einsum("nik,ni->k", intr.j_params, ws)


def segment_cost(
    model,
    state: BAState,
    imageset_idx,
    camera_idx,
    point_idx,
    measured_px,
    obs_valid,
    warm_xy,
    *,
    huber_px: float = 1.0,
    max_proj_iterations: int = 10,
    grid_shape=None,
):
    """Cost-only evaluation (for LM accept/reject tests).

    Returns (per-obs robust cost, validity, warm pixels).
    """
    from camera_calibration_tpu.ba.state import broadcast_rows

    dtype = state.points.dtype
    x = broadcast_rows(state.points, point_idx, grid_shape, 1)
    x_cam, _ = transform_to_camera(
        state, imageset_idx, camera_idx, x, grid_shape=grid_shape
    )
    px, _, pvalid = protocol.project_points(
        model, x_cam, init_xy=warm_xy, max_iterations=max_proj_iterations
    )
    valid = obs_valid & pvalid
    r = px - measured_px
    sq = jnp.sum(r * r, axis=-1)
    cost = losses.huber_cost(sq, jnp.asarray(huber_px, dtype)) * valid.astype(dtype)
    new_warm = jnp.where(pvalid[:, None], px, warm_xy)
    return cost, valid, new_warm
