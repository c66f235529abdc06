"""Joint bundle adjustment: Levenberg-Marquardt with Jacobi-preconditioned CG.

The default BA solver — algorithmic parity with the reference's matrix-free
CUDA LM+PCG path (reference: applications/camera_calibration/src/
camera_calibration/bundle_adjustment/cuda_joint_optimization.cc:332-470 and
cuda_joint_optimization.cu:391-765), redesigned for TPU:

- Per-observation residual + Jacobian *blocks* are computed once per LM
  iteration (closed form, batched) and cached in HBM; the reference instead
  re-derives the Jacobian on the fly in every PCG kernel.
- (JᵀWJ + λI)·v matvecs are gathers + small einsum contractions +
  one-hot MXU segment reductions (ops/segsum.py) — the XLA equivalents of
  the reference's three atomic accumulation modes
  (cuda_joint_optimization.cu:418-451), conflict-free by construction.
- Jacobi preconditioner M = diag(JᵀWJ) + λ (cuda_joint_optimization.cu:
  391-492 PCGInit); λ accept/reject ·{0.5, 2} on the host loop.
- Invalid projections use the reference's *paired cost comparison*: an LM
  step is judged on the observations valid in both states
  (lm_optimizer.h:993-1011 semantics).
- Warm-started projections: converged pixels are carried between
  iterations (the reference's last_projection trick,
  joint_optimization.cc:325-343).

Observations are given as a tuple of per-camera SoA tables (dataset.
split_by_camera) and passed to the jitted LM step as ordinary pytree
arguments — shard their observation axis over a device mesh and XLA GSPMD
turns the segment_sum reductions into cross-device collectives; that is
the whole multi-chip story (no reference analog: it is single-GPU).

The gauge freedom (global similarity + per-camera rotation ambiguities) is
left to λ damping, exactly as the reference does
(joint_optimization.cc:816-864); the first camera's extrinsics tangent is
frozen as the rig anchor.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.ba import residuals as res
from camera_calibration_tpu.ba.state import (
    BAState,
    BATangent,
    apply_freeze,
    fix_gauge_mask,
    retract,
    zero_tangent,
)
from camera_calibration_tpu.ops import linalg, manifolds
from camera_calibration_tpu.ops.segsum import onehot_segment_sum


@dataclasses.dataclass(frozen=True)
class BAOptions:
    max_lm_iterations: int = 30
    max_pcg_iterations: int = 50
    # Solver mode — the reference's SchurMode family
    # (joint_optimization.cc:794-814, Readme.md:330-352) mapped to TPU:
    #   "schur"       eliminate the 3×3 point blocks, PCG on the reduced
    #                 camera system (block=3 point elimination);
    #   "schur_poses" eliminate the 6×6 imageset pose blocks, PCG on the
    #                 reduced points+cam+intrinsics system (block=6 pose
    #                 elimination — the reference default);
    #   "schur_direct"        block=6 pose elimination + DENSE direct
    #                 (Cholesky) solve of the explicitly assembled reduced
    #                 system — the reference's SchurMode::Dense
    #                 (lm_optimizer.h:1246-1369); memory ∝ reduced dim²;
    #   "schur_direct_points" same with block=3 point elimination;
    #   "pcg"         PCG on the full system (no elimination);
    #   "auto"        resolved by optimize() from the problem size:
    #                 schur_direct while the reduced dim fits in memory
    #                 (the reference's Dense default), schur beyond.
    solver: str = "schur"
    # Inexact-Newton forcing: stop CG when the residual drops below this
    # fraction of ||b||. LM test steps don't need exact solves; the
    # reference's PCG similarly early-stops (cuda_joint_optimization.cc:448).
    pcg_rel_tolerance: float = 0.03
    huber_px: float = 1.0
    # Projection LM iterations per blocks sweep.  Projections warm-start
    # from the previous sweep's pixels, so 4 matches the converged
    # trajectory of 10 on calibration-shaped problems at ~half the
    # blocks-pass cost (measured on the 262k-obs bench; see bench.py).
    proj_iterations: int = 4
    lambda_initial_factor: float = 1e-4  # × mean diag
    lambda_min: float = 1e-10
    cost_reduction_threshold: float = 1e-5  # relative; reference: 1e-4 / 1.0
    max_consecutive_rejects: int = 3
    # variable groups to freeze ("poses", "extrinsics", "points",
    # "intrinsics"); freezing points+intrinsics = the reference's
    # --localize_only mode
    freeze: tuple = ()
    # LM iterations fused into one device call (lax.scan) — amortizes the
    # per-dispatch latency of the remote TPU runtime.  1 = step-per-call
    # (checkpoint/callback granularity of one iteration).
    lm_steps_per_call: int = 1
    # Run verify_cost() once before optimizing (the reference's
    # debug_verify_cost harness toggle, test/util.h:464).
    debug_verify: bool = False
    # Observation-table layout.  "auto" re-lays each per-camera table into
    # dense (imagesets × points) grid layout (dataset.to_grid_layout) when
    # the fill ratio justifies it — segment reductions become axis sums
    # and state gathers become broadcasts, the TPU-native shape of a
    # calibration problem.  "flat" keeps the given tables.
    table_layout: str = "auto"
    # "auto" uses grid layout when M·P ≤ this factor × valid obs count.
    grid_layout_max_expand: float = 1.6
    # Memory-bounded block computation: when set, residual/Jacobian blocks
    # are evaluated in lax.map chunks of this many observations so the
    # projection/IFT transients never exceed the chunk footprint — the
    # TPU analog of the reference's on-the-fly SchurModes
    # (lm_optimizer.h:297-307): bound memory by streaming, keep the
    # (irreducible) per-observation block cache.  Must divide the padded
    # table size.  None = single fused evaluation.
    block_chunk: int | None = None
    # When set, optimize() runs under jax.profiler.trace(profile_dir) so
    # the whole LM run can be inspected in TensorBoard/XProf — the
    # framework's analog of the reference's scoped Timer registry
    # (libvis/timing.h:47).
    profile_dir: str | None = None
    # Warm-start each PCG solve from the previous LM iteration's step
    # (scan path only, where the delta is carried on-device).  Costs one
    # extra matvec to form the initial residual; successive LM systems
    # differ only in λ and the (small) block updates, so the previous
    # step is usually an excellent initial iterate.
    cg_warm_start: bool = False
    # Jacobian-block dtype INSIDE the CG matvecs ("float32"|"bfloat16").
    # The CG sweeps are HBM-bound on the cached Jacobian rows; bf16
    # copies halve the bytes while the gradient, RHS, preconditioner and
    # accept test stay f32 — the ~4e-3 relative Hessian perturbation is
    # far inside the inexact-Newton truncation already accepted
    # (pcg_rel_tolerance 0.03, capped iterations), so only the CG
    # iterate path changes, never what "converged" means.
    cg_jacobian_dtype: str = "float32"
    # λ update rule. "halve_double" is the reference's schedule
    # (accept → λ/2, reject → λ×2, lm_optimizer.h:993-1011).
    # "gain_ratio" is the Nielsen/Madsen schedule: the accept-side
    # factor adapts to ρ = actual/predicted cost reduction
    # (λ ← λ·max(1/3, 1−(2ρ−1)³)), which can cut iterations-to-converge
    # when the quadratic model is locally accurate.  Measured on the
    # bench problem (see RESULTS.md round 5) and kept as an option.
    lambda_schedule: str = "halve_double"


@dataclasses.dataclass
class OptimizationReport:
    """Per-run solver metrics (the reference's OptimizationReport,
    lm_optimizer.h:40-77, which records cost/Jacobian vs solve seconds
    per LM run — here per-call wall clock on the driving host, split
    into first-call (trace+compile) and steady-state step time)."""

    iterations: int = 0
    accepted: int = 0
    rejected: int = 0
    initial_cost: float = float("nan")
    final_cost: float = float("nan")
    pcg_iterations_total: int = 0
    first_call_seconds: float = 0.0  # includes trace+compile
    step_seconds: float = 0.0  # steady-state device steps after the first
    total_seconds: float = 0.0

    def as_dict(self):
        return dataclasses.asdict(self)


def _grid_mp(seg, m=None, p=None):
    """The (M, P) grid shape if this segment is in grid layout (else None).

    When ``m``/``p`` are given, the layout is only used if it matches the
    state's imageset/point counts (it always does for tables produced by
    ``dataset.to_grid_layout``; the guard keeps sliced tables safe).
    """
    gs = getattr(seg, "grid_shape", None)
    if gs is None:
        return None
    if m is not None and gs[0] != m:
        return None
    if p is not None and gs[1] != p:
        return None
    return gs


def _jv_imageset(seg, j, arr):
    """einsum('nik,nk->ni', j, arr[seg.imageset]) without the gather."""
    gs = _grid_mp(seg, m=arr.shape[0])
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum("mpik,mk->mpi", jg, arr).reshape(j.shape[:2])
    return jnp.einsum("nik,nk->ni", j, arr[seg.imageset])


def _jv_point(seg, j, arr):
    """einsum('nik,nk->ni', j, arr[seg.point]) without the gather."""
    gs = _grid_mp(seg, p=arr.shape[0])
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum("mpik,pk->mpi", jg, arr).reshape(j.shape[:2])
    return jnp.einsum("nik,nk->ni", j, arr[seg.point])


def _jtw_imageset(seg, j, ws, m):
    """segment_sum(einsum('nik,ni->nk', j, ws), seg.imageset, m)."""
    gs = _grid_mp(seg, m=m)
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum("mpik,mpi->mk", jg, ws.reshape(mm, pp, 2))
    return onehot_segment_sum(
        jnp.einsum("nik,ni->nk", j, ws), seg.imageset, m
    )


def _jtw_point(seg, j, ws, p):
    """segment_sum(einsum('nik,ni->nk', j, ws), seg.point, p)."""
    gs = _grid_mp(seg, p=p)
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum("mpik,mpi->pk", jg, ws.reshape(mm, pp, 2))
    return onehot_segment_sum(
        jnp.einsum("nik,ni->nk", j, ws), seg.point, p
    )


def _jtwj_diag_imageset(seg, j, w, m):
    """segment_sum(einsum('nij,nik,n->njk', j, j, w), seg.imageset, m)."""
    gs = _grid_mp(seg, m=m)
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum(
            "mpij,mpik,mp->mjk", jg, jg, w.reshape(mm, pp)
        )
    return onehot_segment_sum(
        jnp.einsum("nij,nik,n->njk", j, j, w), seg.imageset, m
    )


def _jtwj_diag_point(seg, j, w, p):
    """segment_sum(einsum('nij,nik,n->njk', j, j, w), seg.point, p)."""
    gs = _grid_mp(seg, p=p)
    if gs is not None:
        mm, pp = gs
        jg = j.reshape((mm, pp) + j.shape[1:])
        return jnp.einsum(
            "mpij,mpik,mp->pjk", jg, jg, w.reshape(mm, pp)
        )
    return onehot_segment_sum(
        jnp.einsum("nij,nik,n->njk", j, j, w), seg.point, p
    )


def _valid_grid_shape(seg, state):
    """The segment's (M, P) grid shape when consistent with the state and
    the table's row count (else None — flat gather path)."""
    gs = getattr(seg, "grid_shape", None)
    if gs is None:
        return None
    m, p = gs
    if (
        m != state.rig_q_global.shape[0]
        or p != state.points.shape[0]
        or m * p != seg.imageset.shape[0]
    ):
        return None
    return gs


def _tree_dot(a, b):
    return jax.tree_util.tree_reduce(
        jnp.add, jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    )


def _flat_cg(matvec_flat, precond_flat, b_flat, options, x0=None):
    """Preconditioned CG on flat tangent vectors.

    The CG vector algebra (dots, axpys, masking) runs on single flat
    arrays: the structured pytree form costs ~8 leaves × several tiny
    ops per iteration, and on this runtime the while-loop body is
    dispatch-bound, not FLOP-bound.  Structured computation lives only
    inside ``matvec_flat``/``precond_flat``.  ``x0`` warm-starts the
    iteration (one extra matvec for the initial residual).
    Returns (x_flat, iters).
    """
    if x0 is None:
        x = jnp.zeros_like(b_flat)
        r = b_flat
    else:
        # Guarded warm start: after a large accepted LM step the previous
        # delta can be a *worse* iterate than zero (||b - A·x0|| > ||b||),
        # and with capped, ||b||-relative-tolerance solves that would
        # actively hurt.  Fall back to the cold start in that case.
        r0 = b_flat - matvec_flat(x0)
        use_warm = jnp.vdot(r0, r0) <= jnp.vdot(b_flat, b_flat)
        x = jnp.where(use_warm, x0, jnp.zeros_like(b_flat))
        r = jnp.where(use_warm, r0, b_flat)
    z = precond_flat(r)
    p = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.sqrt(jnp.vdot(b_flat, b_flat))
    tol = options.pcg_rel_tolerance * b_norm

    def body(c):
        x, r, z, p, rz, k = c
        ap = matvec_flat(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-35)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond_flat(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-35)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    def cond(c):
        _, r, _, _, _, k = c
        rn = jnp.sqrt(jnp.vdot(r, r))
        return (k < options.max_pcg_iterations) & (rn > tol)

    x, _, _, _, _, iters = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.int32(0))
    )
    return x, iters


def _tree_map2(f, a, b):
    return jax.tree_util.tree_map(f, a, b)


def compute_blocks(data, state: BAState, warm_xy, options: BAOptions):
    """Residual/Jacobian blocks for all cameras.

    data: tuple of per-camera ObservationTable; warm_xy: tuple of (n_c, 2).
    Returns (blocks list, new warm tuple).
    """
    blocks = []
    new_warm = []
    for ci, seg in enumerate(data):
        model = state.intrinsics[ci]
        from camera_calibration_tpu.models.central_generic import (
            CentralGenericModel,
        )

        frames = (
            manifolds.direction_tangents(model.grid)
            if isinstance(model, CentralGenericModel)
            else None
        )

        def eval_blocks(tbl, warm, gs):
            return res.segment_blocks(
                model,
                state,
                tbl.imageset,
                tbl.camera,
                tbl.point,
                tbl.pixel,
                tbl.valid,
                warm,
                huber_px=options.huber_px,
                max_proj_iterations=options.proj_iterations,
                tangent_frames=frames,
                grid_shape=gs,
            )

        gs = _valid_grid_shape(seg, state)
        chunk = options.block_chunk
        n_obs = seg.imageset.shape[0]
        if chunk and n_obs > chunk and n_obs % chunk == 0:
            k = n_obs // chunk

            tbl_c = jax.tree_util.tree_map(
                lambda a: a.reshape((k, chunk) + a.shape[1:]), seg
            )
            warm_c = warm_xy[ci].reshape(k, chunk, 2)
            # chunks break the (M, P) row structure: flat evaluation
            b, w = jax.lax.map(
                lambda args: eval_blocks(args[0], args[1], None),
                (tbl_c, warm_c),
            )

            def merge_lead(a):
                return a.reshape((n_obs,) + a.shape[2:])

            bi = b.intr
            if isinstance(bi, res.GridIntr):
                # stacked (k_chunks, F, chunk): move chunks next to the
                # obs axis, merge — stays 2-D/3-D throughout
                jw = jnp.moveaxis(bi.j_win, 0, 1)  # (F, k_chunks, chunk)
                jw = jw.reshape(jw.shape[0], n_obs)
                intr_m = res.GridIntr(
                    j_win=jw, base_xy=merge_lead(bi.base_xy),
                    k_tangent=bi.k_tangent,
                )
            else:
                intr_m = res.DenseIntr(j_params=merge_lead(bi.j_params))
            b = res.ObsBlocks(
                r=merge_lead(b.r),
                j_rig=merge_lead(b.j_rig),
                j_cam=merge_lead(b.j_cam),
                j_point=merge_lead(b.j_point),
                intr=intr_m,
                weight=merge_lead(b.weight),
                valid=merge_lead(b.valid),
                cost=merge_lead(b.cost),
            )
            w = w.reshape(n_obs, 2)
        else:
            b, w = eval_blocks(seg, warm_xy[ci], gs)
        blocks.append(b)
        new_warm.append(w)
    return blocks, tuple(new_warm)


def apply_j(data, blocks, tangent: BATangent):
    """J·v: list of per-observation 2-vectors, one entry per camera."""
    outs = []
    for ci, seg in enumerate(data):
        b = blocks[ci]
        s = (
            _jv_imageset(seg, b.j_rig, tangent.rig)
            + jnp.einsum("nik,k->ni", b.j_cam, tangent.cam[ci])
            + _jv_point(seg, b.j_point, tangent.points)
            + res.intr_apply_j(b.intr, tangent.intr[ci])
        )
        outs.append(s)
    return outs


def apply_jtw(data, blocks, s_list, state: BAState) -> BATangent:
    """JᵀW·s: scatter-add per-observation contributions into the tangent."""
    t = zero_tangent(state)
    rig, cam, pts = t.rig, t.cam, t.points
    intr = list(t.intr)
    for ci, seg in enumerate(data):
        b = blocks[ci]
        ws = s_list[ci] * b.weight[:, None]  # (n, 2)
        rig = rig + _jtw_imageset(seg, b.j_rig, ws, rig.shape[0])
        cam = cam.at[ci].add(jnp.sum(jnp.einsum("nik,ni->nk", b.j_cam, ws), axis=0))
        pts = pts + _jtw_point(seg, b.j_point, ws, pts.shape[0])
        intr[ci] = intr[ci] + res.intr_apply_jtw(b.intr, ws, intr[ci])
    return BATangent(rig=rig, cam=cam, points=pts, intr=tuple(intr))


def _masked(tangent: BATangent, mask: BATangent) -> BATangent:
    return _tree_map2(lambda t, m: t * m, tangent, mask)


def jtwj_block_diag(data, blocks, state: BAState):
    """Variable-block diagonal of JᵀWJ: 6×6 rig/cam, 3×3 point, per-knot
    K×K grid blocks (or the full dense-parametric block).

    The block-Jacobi preconditioner built from these typically needs
    several times fewer CG iterations than the scalar diagonal — the role
    of the reference's per-block D⁻¹ in its Schur machinery
    (lm_optimizer.h:1246-1369)."""
    dtype = state.points.dtype
    m = state.rig_q_global.shape[0]
    c = state.cam_q_rig.shape[0]
    p_n = state.points.shape[0]
    rig = jnp.zeros((m, 6, 6), dtype)
    cam = jnp.zeros((c, 6, 6), dtype)
    pts = jnp.zeros((p_n, 3, 3), dtype)
    intr = []
    for ci, seg in enumerate(data):
        b = blocks[ci]
        w = b.weight
        rig = rig + _jtwj_diag_imageset(seg, b.j_rig, w, m)
        cam = cam.at[ci].add(
            jnp.einsum("nij,nik,n->jk", b.j_cam, b.j_cam, w)
        )
        pts = pts + _jtwj_diag_point(seg, b.j_point, w, p_n)
        bi = b.intr
        if isinstance(bi, res.GridIntr):
            from camera_calibration_tpu.ba import window_pallas as wp

            zero = zero_tangent(state).intr[ci]
            gh, gw = zero.shape[0], zero.shape[1]
            kk = bi.k_tangent
            # One-hot window contractions instead of a 16n-row scatter-add:
            # TPU scatters serialize per row (measured ~300 ms at 262k
            # obs).
            if wp.window_pallas_enabled(bi.j_win.dtype):
                # TPU form: stacked-dot Pallas kernel (one MXU launch).
                knot = wp.window_block_diag(
                    bi.j_win, bi.base_xy, w, gh, gw, kk
                )
            else:
                oy, ox = res._window_onehots(
                    bi.base_xy, gh, gw, bi.j_win.dtype
                )
                # XLA/CPU form: two batched contractions, ONE reduction
                # over the (possibly sharded) observation axis — a single
                # collective under GSPMD instead of 16·k(k+1)/2.
                oy_s = jnp.stack(oy) * w[None, :, None]  # (4, n, gh)
                ox_s = jnp.stack(ox)  # (4, n, gw)
                jw = bi.j_win.reshape(2, 4, 4, kk, -1)
                prod = jnp.einsum("iyxjn,iyxln->yxjln", jw, jw)
                t = jnp.einsum("xnw,yxjln->ynwjl", ox_s, prod)
                knot = jnp.einsum("ynh,ynwjl->hwjl", oy_s, t)
            intr.append(knot)
        else:
            intr.append(
                jnp.einsum("nij,nik,n->jk", bi.j_params, bi.j_params, w)
            )
    return rig, cam, pts, tuple(intr)


def make_block_preconditioner(block_diag, lam, state):
    """Invert damped diagonal blocks; returns an apply(r)->z function."""
    rig, cam, pts, intr = block_diag
    dtype = state.points.dtype

    def damped_inv(a):
        k = a.shape[-1]
        return linalg.inv_spd_blocks(a + lam * jnp.eye(k, dtype=dtype))

    rig_inv = damped_inv(rig)
    cam_inv = damped_inv(cam)
    pts_inv = damped_inv(pts)
    intr_inv = []
    for ii in intr:
        if ii.ndim == 4:  # (gh, gw, k, k) per-knot blocks
            intr_inv.append(damped_inv(ii))
        else:
            intr_inv.append(damped_inv(ii))

    def apply(r: BATangent) -> BATangent:
        new_intr = []
        for inv, ri in zip(intr_inv, r.intr):
            if inv.ndim == 4:
                new_intr.append(jnp.einsum("hwjk,hwk->hwj", inv, ri))
            else:
                new_intr.append(inv @ ri)
        return BATangent(
            rig=jnp.einsum("mjk,mk->mj", rig_inv, r.rig),
            cam=jnp.einsum("cjk,ck->cj", cam_inv, r.cam),
            points=jnp.einsum("pjk,pk->pj", pts_inv, r.points),
            intr=tuple(new_intr),
        )

    return apply


def _apply_j_subset(data, blocks, tangent: BATangent, *, rig=True, cam=True,
                    points=True, intr=True):
    """J·v restricted to a subset of the variable groups."""
    outs = []
    for ci, seg in enumerate(data):
        b = blocks[ci]
        s = jnp.zeros_like(b.r)
        if rig:
            s = s + _jv_imageset(seg, b.j_rig, tangent.rig)
        if cam:
            s = s + jnp.einsum("nik,k->ni", b.j_cam, tangent.cam[ci])
        if points:
            s = s + _jv_point(seg, b.j_point, tangent.points)
        if intr:
            s = s + res.intr_apply_j(b.intr, tangent.intr[ci])
        outs.append(s)
    return outs


def _apply_jt_subset(data, blocks, s_list, state: BAState, *, rig=True,
                     cam=True, points=True, intr=True) -> BATangent:
    """JᵀW·s restricted to a subset of groups (others left zero)."""
    t = zero_tangent(state)
    rig_t, cam_t, pts_t = t.rig, t.cam, t.points
    intr_t = list(t.intr)
    for ci, seg in enumerate(data):
        b = blocks[ci]
        ws = s_list[ci] * b.weight[:, None]
        if rig:
            rig_t = rig_t + _jtw_imageset(seg, b.j_rig, ws, rig_t.shape[0])
        if cam:
            cam_t = cam_t.at[ci].add(
                jnp.sum(jnp.einsum("nik,ni->nk", b.j_cam, ws), axis=0)
            )
        if points:
            pts_t = pts_t + _jtw_point(seg, b.j_point, ws, pts_t.shape[0])
        if intr:
            intr_t[ci] = intr_t[ci] + res.intr_apply_jtw(b.intr, ws, intr_t[ci])
    return BATangent(rig=rig_t, cam=cam_t, points=pts_t, intr=tuple(intr_t))


def _cg_cast_blocks(blocks, options):
    """bf16 copies of the Jacobian blocks for the CG matvec sweeps.

    Residuals/weights/validity stay f32 (they feed costs and RHS); only
    the Jacobian rows — the HBM traffic of the matvecs — are halved.
    """
    if options.cg_jacobian_dtype != "bfloat16":
        return blocks
    bf = jnp.bfloat16

    def cast(x):
        # optimization_barrier forces the bf16 copy to MATERIALIZE once
        # per solve; otherwise XLA rematerializes the cheap convert into
        # every CG sweep, which re-reads the f32 rows each iteration and
        # erases the bandwidth win.
        return jax.lax.optimization_barrier(x.astype(bf))

    out = []
    for b in blocks:
        bi = b.intr
        if isinstance(bi, res.GridIntr):
            bi = res.GridIntr(j_win=cast(bi.j_win), base_xy=bi.base_xy,
                              k_tangent=bi.k_tangent)
        else:
            bi = res.DenseIntr(j_params=cast(bi.j_params))
        out.append(res.ObsBlocks(
            r=b.r, j_rig=cast(b.j_rig), j_cam=cast(b.j_cam),
            j_point=cast(b.j_point), intr=bi, weight=b.weight,
            valid=b.valid, cost=b.cost,
        ))
    return out


def schur_pcg_solve(data, blocks, state, grad, block_diag, lam, mask, options,
                    eliminate: str = "points", x0=None):
    """Solve (JᵀWJ + λI) δ = −grad by block elimination + PCG.

    eliminate="points": eliminate the 3×3 point blocks, PCG on the reduced
    camera system S = A − B D⁻¹ Bᵀ (reference block=3 SchurMode,
    joint_optimization.cc:794-814).
    eliminate="poses": eliminate the 6×6 imageset pose blocks — each
    observation touches exactly one imageset, so H_rig,rig is block
    diagonal — and PCG over cam+points+intrinsics (the reference *default*,
    joint_optimization.cc:796-804 block=6 path).

    The reduced matvec stays matrix-free (two extra per-observation
    passes); elimination conditions the system far better than damping
    alone: measured ~3-5× fewer CG iterations at equal accuracy on the
    benchmark problem.
    """
    rig_b, cam_b, pts_b, intr_b = block_diag
    dtype = state.points.dtype

    if eliminate == "points":
        elim_b = pts_b
        keep = dict(rig=True, cam=True, points=False, intr=True)
    else:
        elim_b = rig_b
        keep = dict(rig=False, cam=True, points=True, intr=True)
    k_el = elim_b.shape[-1]
    d_inv = linalg.inv_spd_blocks(elim_b + lam * jnp.eye(k_el, dtype=dtype))

    def zero_elim(t: BATangent) -> BATangent:
        if eliminate == "points":
            return BATangent(rig=t.rig, cam=t.cam,
                             points=jnp.zeros_like(t.points), intr=t.intr)
        return BATangent(rig=jnp.zeros_like(t.rig), cam=t.cam,
                         points=t.points, intr=t.intr)

    def get_elim(t: BATangent):
        return t.points if eliminate == "points" else t.rig

    def with_elim(t: BATangent, val):
        if eliminate == "points":
            return BATangent(rig=t.rig, cam=t.cam, points=val, intr=t.intr)
        return BATangent(rig=val, cam=t.cam, points=t.points, intr=t.intr)

    def apply_j_keep(v):
        return _apply_j_subset(data, blocks, v, **keep)

    def apply_jt_keep(s_list):
        return _apply_jt_subset(data, blocks, s_list, state, **keep)

    def apply_j_elim(val):
        t = with_elim(zero_tangent(state), val)
        return _apply_j_subset(
            data, blocks, t,
            rig=(eliminate == "poses"), cam=False,
            points=(eliminate == "points"), intr=False,
        )

    def apply_jt_elim(s_list):
        t = _apply_jt_subset(
            data, blocks, s_list, state,
            rig=(eliminate == "poses"), cam=False,
            points=(eliminate == "points"), intr=False,
        )
        return get_elim(t)

    precond = make_block_preconditioner(
        (
            jnp.zeros_like(rig_b) if eliminate == "poses" else rig_b,
            cam_b,
            jnp.zeros_like(pts_b) if eliminate == "points" else pts_b,
            intr_b,
        ),
        lam,
        state,
    )

    from jax.flatten_util import ravel_pytree

    mask_keep_flat, unravel = ravel_pytree(zero_elim(mask))

    # CG matvecs sweep the Jacobian cache once per iteration (HBM-bound);
    # they optionally run on bf16 copies.  RHS assembly and the final
    # back-substitution below keep the f32 blocks.
    blocks_mv = _cg_cast_blocks(blocks, options)

    def matvec_flat(vf):
        v = unravel(vf * mask_keep_flat)
        u = _apply_j_subset(data, blocks_mv, v, **keep)
        t_e = _apply_jt_subset(
            data, blocks_mv, u, state,
            rig=(eliminate == "poses"), cam=False,
            points=(eliminate == "points"), intr=False,
        )
        t_e = get_elim(t_e)
        y_e = jnp.einsum("pjk,pk->pj", d_inv, t_e)
        t2 = with_elim(zero_tangent(state), y_e)
        u2 = _apply_j_subset(
            data, blocks_mv, t2,
            rig=(eliminate == "poses"), cam=False,
            points=(eliminate == "points"), intr=False,
        )
        diff = [a - b_ for a, b_ in zip(u, u2)]
        out = ravel_pytree(
            _apply_jt_subset(data, blocks_mv, diff, state, **keep)
        )[0]
        return (out + lam * vf) * mask_keep_flat

    def precond_flat(rf):
        zf = ravel_pytree(precond(unravel(rf * mask_keep_flat)))[0]
        return zf * mask_keep_flat

    # reduced RHS: b_keep = −g_keep + B D⁻¹ g_elim
    g_e = get_elim(grad)
    y_e = jnp.einsum("pjk,pk->pj", d_inv, g_e)
    u2 = apply_j_elim(y_e)
    corr = apply_jt_keep(u2)
    b = _tree_map2(lambda g, c: -g + c, grad, corr)
    b_flat = ravel_pytree(b)[0] * mask_keep_flat

    x0_flat = (
        ravel_pytree(zero_elim(x0))[0] * mask_keep_flat
        if x0 is not None else None
    )
    x_flat, iters = _flat_cg(matvec_flat, precond_flat, b_flat, options,
                             x0=x0_flat)
    x = unravel(x_flat * mask_keep_flat)

    # back-substitution: δ_e = D⁻¹ (−g_e − Bᵀ δ_keep)
    u = apply_j_keep(x)
    bt_x = apply_jt_elim(u)
    delta_e = jnp.einsum("pjk,pk->pj", d_inv, -g_e - bt_x)
    x = with_elim(x, delta_e)
    return _masked(x, mask), iters


def _flat_offsets(state):
    """Flat-vector offsets of each tangent group, in ravel_pytree order.

    Returns ({key: (offset, size, shape)}, total) where key is 'rig',
    'cam', 'points', or ('intr', camera_index).
    """
    zt = zero_tangent(state)
    leaves = jax.tree_util.tree_flatten_with_path(zt)[0]
    offsets = {}
    off = 0
    for path, leaf in leaves:
        names = []
        for k in path:
            if hasattr(k, "name"):
                names.append(k.name)
            elif hasattr(k, "idx"):
                names.append(k.idx)
            elif hasattr(k, "key"):
                names.append(k.key)
        key = names[0] if len(names) == 1 else tuple(names)
        offsets[key] = (off, int(leaf.size), tuple(leaf.shape))
        off += int(leaf.size)
    return offsets, off


def _dense_intr_j(bi, gh, gw, k):
    """Materialize the per-observation dense intrinsics Jacobian (n, 2, G)
    with G = gh·gw·k from the sparse 4×4-window form.

    This is the dense-H analog of the reference's explicit off-diagonal
    storage (lm_optimizer_update_accumulator.h routes each JᵀJ
    contribution into a dense H); only the schur_direct solver pays this
    footprint (n·2·G floats).
    """
    if isinstance(bi, res.DenseIntr):
        return bi.j_params
    n = bi.base_xy.shape[0]
    oy, ox = res._window_onehots(bi.base_xy, gh, gw, bi.j_win.dtype)
    out = jnp.zeros((n, 2, gh, gw, k), bi.j_win.dtype)
    for y in range(4):
        for x in range(4):
            for i in range(2):
                lo = i * 16 * k + (y * 4 + x) * k
                rows = bi.j_win[lo:lo + k]  # (k, n)
                term = jnp.einsum("kn,nh,nw->nhwk", rows, oy[y], ox[x])
                out = out.at[:, i].add(term)
    return out.reshape(n, 2, gh * gw * k)


def schur_direct_solve(data, blocks, state, grad, block_diag, lam, mask,
                       options, eliminate: str = "poses"):
    """Solve (JᵀWJ + λI) δ = −grad by block elimination + a DENSE direct
    solve of the reduced system — the reference's SchurMode::Dense
    (SolveWithSchurComplementDenseOffDiag, lm_optimizer.h:1246-1369):
    per-block D⁻¹, explicit BᵀD⁻¹B GEMM (MXU), Cholesky-factored reduced
    solve, back-substitution.

    eliminate="poses" reduces onto [cam, points, intrinsics] (the
    reference default block=6 path, joint_optimization.cc:796-804);
    eliminate="points" reduces onto [poses, cam, intrinsics] (block=3).

    Requires grid-layout tables (the dense cross-blocks are assembled as
    (M, P)-shaped einsums); memory scales with the square of the reduced
    dimension — use the PCG modes for very large problems, exactly as the
    reference trades its dense mode against sparse/on-the-fly modes
    (Readme.md:330-352).
    """
    rig_b, cam_b, pts_b, intr_b = block_diag
    dtype = state.points.dtype
    offs, f_dim = _flat_offsets(state)
    m_n = state.rig_q_global.shape[0]
    p_n = state.points.shape[0]
    rig_off = offs["rig"][0]
    cam_off = offs["cam"][0]
    pt_off = offs["points"][0]

    if eliminate == "poses":
        elim_b, k_el, n_el, elim_off = rig_b, 6, m_n, rig_off
    else:
        elim_b, k_el, n_el, elim_off = pts_b, 3, p_n, pt_off
    d_inv = linalg.inv_spd_blocks(elim_b + lam * jnp.eye(k_el, dtype=dtype))

    h = jnp.zeros((f_dim, f_dim), dtype)
    c_mat = jnp.zeros((n_el, f_dim, k_el), dtype)

    def add_sym(h, r0, rn, c0, cn, blk):
        """Add a cross block and its transpose at static offsets."""
        h = h.at[r0:r0 + rn, c0:c0 + cn].add(blk)
        h = h.at[c0:c0 + cn, r0:r0 + rn].add(blk.T)
        return h

    # Within-group diagonal blocks of the kept variables.
    if eliminate == "poses":
        hpp = jnp.zeros((p_n, 3, p_n, 3), dtype)
        idx = jnp.arange(p_n)
        hpp = hpp.at[idx, :, idx, :].set(pts_b)
        h = h.at[pt_off:pt_off + 3 * p_n, pt_off:pt_off + 3 * p_n].add(
            hpp.reshape(3 * p_n, 3 * p_n)
        )
    else:
        hrr = jnp.zeros((m_n, 6, m_n, 6), dtype)
        idx = jnp.arange(m_n)
        hrr = hrr.at[idx, :, idx, :].set(rig_b)
        h = h.at[rig_off:rig_off + 6 * m_n, rig_off:rig_off + 6 * m_n].add(
            hrr.reshape(6 * m_n, 6 * m_n)
        )
    for ci in range(cam_b.shape[0]):
        h = h.at[cam_off + 6 * ci:cam_off + 6 * ci + 6,
                 cam_off + 6 * ci:cam_off + 6 * ci + 6].add(cam_b[ci])

    for ci, seg in enumerate(data):
        gs = _valid_grid_shape(seg, state)
        if gs is None:
            raise ValueError(
                "schur_direct requires grid-layout observation tables "
                "(options.table_layout='auto' on calibration-shaped "
                "problems); use the PCG solver modes otherwise"
            )
        mm, pp = gs
        b = blocks[ci]
        w = b.weight.reshape(mm, pp)
        jr = b.j_rig.reshape(mm, pp, 2, 6)
        jc = b.j_cam.reshape(mm, pp, 2, 6)
        jp = b.j_point.reshape(mm, pp, 2, 3)
        i_off, i_size, i_shape = offs[("intr", ci)]
        if isinstance(b.intr, res.GridIntr):
            gh, gw, kt = i_shape
            jd = _dense_intr_j(b.intr, gh, gw, kt).reshape(mm, pp, 2, i_size)
        else:
            jd = b.intr.j_params.reshape(mm, pp, 2, i_size)
        co = cam_off + 6 * ci

        # Kept-variable blocks (intrinsics dense; cross-group off-diags).
        h_ii = jnp.einsum("mpig,mpih,mp->gh", jd, jd, w)
        h = h.at[i_off:i_off + i_size, i_off:i_off + i_size].add(h_ii)
        h_ci = jnp.einsum("mpia,mpig,mp->ag", jc, jd, w)
        h = add_sym(h, co, 6, i_off, i_size, h_ci)
        if eliminate == "poses":
            h_pi = jnp.einsum("mpia,mpig,mp->pag", jp, jd, w)
            h = add_sym(h, pt_off, 3 * p_n, i_off, i_size,
                        h_pi.reshape(3 * pp, i_size))
            h_cp = jnp.einsum("mpia,mpib,mp->pab", jc, jp, w)
            h = add_sym(h, co, 6, pt_off, 3 * p_n,
                        h_cp.transpose(1, 0, 2).reshape(6, 3 * pp))
            # Elimination cross blocks B = H_keep,pose(m).
            c_pt = jnp.einsum("mpia,mpib,mp->mpab", jp, jr, w)
            c_mat = c_mat.at[:, pt_off:pt_off + 3 * p_n, :].add(
                c_pt.reshape(mm, 3 * pp, 6)
            )
            c_cam = jnp.einsum("mpia,mpib,mp->mab", jc, jr, w)
            c_mat = c_mat.at[:, co:co + 6, :].add(c_cam)
            c_intr = jnp.einsum("mpig,mpib,mp->mgb", jd, jr, w)
            c_mat = c_mat.at[:, i_off:i_off + i_size, :].add(c_intr)
        else:
            h_ri = jnp.einsum("mpia,mpig,mp->mag", jr, jd, w)
            h = add_sym(h, rig_off, 6 * m_n, i_off, i_size,
                        h_ri.reshape(6 * mm, i_size))
            h_rc = jnp.einsum("mpia,mpib,mp->mab", jr, jc, w)
            h = add_sym(h, rig_off, 6 * m_n, co, 6,
                        h_rc.reshape(6 * mm, 6))
            # Elimination cross blocks B = H_keep,point(p).
            c_rig = jnp.einsum("mpia,mpib,mp->pmab", jr, jp, w)
            c_mat = c_mat.at[:, rig_off:rig_off + 6 * m_n, :].add(
                c_rig.reshape(pp, 6 * mm, 3)
            )
            c_cam = jnp.einsum("mpia,mpib,mp->pab", jc, jp, w)
            c_mat = c_mat.at[:, co:co + 6, :].add(c_cam)
            c_intr = jnp.einsum("mpig,mpib,mp->pgb", jd, jp, w)
            c_mat = c_mat.at[:, i_off:i_off + i_size, :].add(c_intr)

    # Schur complement S = H_keep − B D⁻¹ Bᵀ (BᵀD⁻¹B on the MXU — the
    # role of the reference's cuBLASXt offload, lm_optimizer.h:1371-1430).
    cd = jnp.einsum("eFa,eab->eFb", c_mat, d_inv)
    h = h - jnp.einsum("eFb,eGb->FG", cd, c_mat)

    from jax.flatten_util import ravel_pytree

    mask_flat, unravel = ravel_pytree(mask)
    keep_flat = mask_flat.at[elim_off:elim_off + k_el * n_el].set(0.0)
    g_flat = ravel_pytree(grad)[0]
    g_e = (
        grad.rig if eliminate == "poses" else grad.points
    )

    # Reduced RHS: −g_keep + B D⁻¹ g_elim.
    y_e = jnp.einsum("eab,eb->ea", d_inv, g_e)
    b_vec = (-g_flat + jnp.einsum("eFa,ea->F", c_mat, y_e)) * keep_flat

    # λ damping + dead rows (eliminated group, gauge/freeze mask) pinned
    # to the identity so the factorization stays PD.
    h = h * keep_flat[:, None] * keep_flat[None, :]
    diag = jnp.diagonal(h) + lam * keep_flat + (1.0 - keep_flat)
    h = h.at[jnp.arange(f_dim), jnp.arange(f_dim)].set(diag)
    x_flat = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(h, lower=True), b_vec
    ) * keep_flat

    # Back-substitution: δ_e = D⁻¹ (−g_e − Bᵀ δ_keep).
    bt_x = jnp.einsum("eFa,F->ea", c_mat, x_flat)
    delta_e = jnp.einsum("eab,eb->ea", d_inv, -g_e - bt_x)
    x = unravel(x_flat)
    if eliminate == "poses":
        x = BATangent(rig=delta_e, cam=x.cam, points=x.points, intr=x.intr)
    else:
        x = BATangent(rig=x.rig, cam=x.cam, points=delta_e, intr=x.intr)
    return _masked(x, mask), jnp.int32(0)


def pcg_solve(data, blocks, state, grad, block_diag, lam, mask, options,
              x0=None):
    """Solve (JᵀWJ + λI) δ = −grad with block-Jacobi preconditioning."""
    from jax.flatten_util import ravel_pytree

    mask_flat, unravel = ravel_pytree(mask)
    precond = make_block_preconditioner(block_diag, lam, state)
    blocks_mv = _cg_cast_blocks(blocks, options)

    def matvec_flat(vf):
        v = unravel(vf * mask_flat)
        jv = apply_j(data, blocks_mv, v)
        hv = ravel_pytree(apply_jtw(data, blocks_mv, jv, state))[0]
        return (hv + lam * vf) * mask_flat

    def precond_flat(rf):
        zf = ravel_pytree(precond(unravel(rf * mask_flat)))[0]
        return zf * mask_flat

    b_flat = -ravel_pytree(grad)[0] * mask_flat
    x0_flat = ravel_pytree(x0)[0] * mask_flat if x0 is not None else None
    x_flat, iters = _flat_cg(matvec_flat, precond_flat, b_flat, options,
                             x0=x0_flat)
    return unravel(x_flat * mask_flat), iters


def total_cost(data, state, warm_xy, options):
    """Robust total cost + per-obs validity (paired-comparison support)."""
    costs, valids, warms = [], [], []
    for ci, seg in enumerate(data):
        def eval_cost(tbl, warm, gs):
            return res.segment_cost(
                state.intrinsics[ci],
                state,
                tbl.imageset,
                tbl.camera,
                tbl.point,
                tbl.pixel,
                tbl.valid,
                warm,
                huber_px=options.huber_px,
                max_proj_iterations=options.proj_iterations,
                grid_shape=gs,
            )

        gs = _valid_grid_shape(seg, state)
        chunk = options.block_chunk
        n_obs = seg.imageset.shape[0]
        if chunk and n_obs > chunk and n_obs % chunk == 0:
            k = n_obs // chunk
            tbl_c = jax.tree_util.tree_map(
                lambda a: a.reshape((k, chunk) + a.shape[1:]), seg
            )
            warm_c = warm_xy[ci].reshape(k, chunk, 2)
            cost, valid, w = jax.lax.map(
                lambda args: eval_cost(args[0], args[1], None),
                (tbl_c, warm_c),
            )
            cost = cost.reshape(n_obs)
            valid = valid.reshape(n_obs)
            w = w.reshape(n_obs, 2)
        else:
            cost, valid, w = eval_cost(seg, warm_xy[ci], gs)
        costs.append(cost)
        valids.append(valid)
        warms.append(w)
    return costs, valids, tuple(warms)


def lm_step(state, warm_xy, lam, data, options: BAOptions, blocks=None,
            prev_delta=None):
    """One LM iteration (pure; jit over (state, warm_xy, lam, data)).

    When ``blocks`` (the residual/Jacobian cache evaluated at ``state``)
    is given, the step reuses it and evaluates a FULL blocks pass at the
    test state instead of the cost-only pass — the test-state blocks
    double as the accept test AND as the next iteration's cache, so each
    LM iteration runs exactly one projection/Jacobian sweep instead of
    two (blocks + cost).  Returns the carried blocks and the step tangent
    (for CG warm starts) as the last outputs.
    The reference evaluates cost twice per iteration
    (lm_optimizer.h:802-965); this restructuring is the TPU win of
    keeping the whole cache device-resident.
    """
    if options.solver == "auto":
        raise ValueError(
            "solver='auto' must be resolved before the jitted step — call "
            "optimize(), or resolve_solver(options, state) first"
        )
    if blocks is None:
        return _lm_step_two_pass(state, warm_xy, lam, data, options)
    x0 = prev_delta if options.cg_warm_start else None
    mask = fix_gauge_mask(state, options.freeze)
    grad = apply_jtw(data, blocks, [b.r for b in blocks], state)
    grad = _masked(grad, mask)
    block_diag = jtwj_block_diag(data, blocks, state)

    rig_b, cam_b, pts_b, intr_b = block_diag
    diag_sum = (
        jnp.sum(jnp.trace(rig_b, axis1=-2, axis2=-1))
        + jnp.sum(jnp.trace(cam_b, axis1=-2, axis2=-1))
        + jnp.sum(jnp.trace(pts_b, axis1=-2, axis2=-1))
        + sum(jnp.sum(jnp.trace(ib, axis1=-2, axis2=-1)) for ib in intr_b)
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(zero_tangent(state))
    )
    mean_diag = diag_sum / n_params
    lam = jnp.where(lam < 0, options.lambda_initial_factor * mean_diag, lam)

    if options.solver == "schur" and "points" not in options.freeze:
        delta, pcg_iters = schur_pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="points", x0=x0,
        )
    elif options.solver == "schur_poses" and "poses" not in options.freeze:
        delta, pcg_iters = schur_pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="poses", x0=x0,
        )
    elif options.solver == "schur_direct" and "poses" not in options.freeze:
        delta, pcg_iters = schur_direct_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="poses",
        )
    elif (options.solver == "schur_direct_points"
          and "points" not in options.freeze):
        delta, pcg_iters = schur_direct_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="points",
        )
    else:
        delta, pcg_iters = pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            x0=x0,
        )
    test_state = apply_freeze(state, retract(state, delta), options.freeze)
    test_blocks, warm2 = compute_blocks(data, test_state, warm_xy, options)

    old_sum = jnp.asarray(0.0, state.points.dtype)
    new_sum = jnp.asarray(0.0, state.points.dtype)
    full_cost = jnp.asarray(0.0, state.points.dtype)
    new_full_cost = jnp.asarray(0.0, state.points.dtype)
    for ci, b in enumerate(blocks):
        tb = test_blocks[ci]
        joint = b.valid & tb.valid
        old_sum = old_sum + jnp.sum(jnp.where(joint, b.cost, 0.0))
        new_sum = new_sum + jnp.sum(jnp.where(joint, tb.cost, 0.0))
        full_cost = full_cost + jnp.sum(b.cost)
        new_full_cost = new_full_cost + jnp.sum(tb.cost)
    accept = new_sum < old_sum

    state = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(accept, b_, a), state, test_state
    )
    blocks = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(accept, b_, a), blocks, list(test_blocks)
    )
    warm = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(accept, b_, a), warm_xy, warm2
    )
    if options.lambda_schedule == "gain_ratio":
        # ρ = actual/predicted reduction with the standard LM prediction
        # L(0) − L(δ) = ½ δᵀ(λδ − g) (Madsen/Nielsen eq. 3.14); the
        # paired sums are the costs the accept decision compares.
        pred = 0.5 * _tree_dot(
            delta, _tree_map2(lambda d, g: lam * d - g, delta, grad)
        )
        rho = (old_sum - new_sum) / jnp.maximum(pred, 1e-30)
        fac = jnp.maximum(
            jnp.asarray(1.0 / 3.0, lam.dtype),
            1.0 - (2.0 * rho - 1.0) ** 3,
        )
        lam = jnp.maximum(
            jnp.where(accept, lam * fac, 2.0 * lam), options.lambda_min
        )
    else:
        lam = jnp.maximum(
            jnp.where(accept, 0.5 * lam, 2.0 * lam), options.lambda_min
        )
    # Rejected steps overshot (λ doubles): zero the warm-start carry so
    # the retry solves the damped system from scratch.
    delta = jax.tree_util.tree_map(
        lambda d: jnp.where(accept, d, jnp.zeros_like(d)), delta
    )
    return (state, warm, lam, accept, full_cost, new_full_cost, pcg_iters,
            old_sum, new_sum, blocks, delta)


def _lm_step_two_pass(state, warm_xy, lam, data, options: BAOptions):
    """One LM iteration, classic two-pass form (blocks + cost-only)."""
    mask = fix_gauge_mask(state, options.freeze)
    blocks, warm1 = compute_blocks(data, state, warm_xy, options)
    grad = apply_jtw(data, blocks, [b.r for b in blocks], state)
    grad = _masked(grad, mask)
    block_diag = jtwj_block_diag(data, blocks, state)

    # λ init from the mean scalar diagonal of the blocks
    rig_b, cam_b, pts_b, intr_b = block_diag
    diag_sum = (
        jnp.sum(jnp.trace(rig_b, axis1=-2, axis2=-1))
        + jnp.sum(jnp.trace(cam_b, axis1=-2, axis2=-1))
        + jnp.sum(jnp.trace(pts_b, axis1=-2, axis2=-1))
        + sum(jnp.sum(jnp.trace(ib, axis1=-2, axis2=-1)) for ib in intr_b)
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(zero_tangent(state))
    )
    mean_diag = diag_sum / n_params
    lam = jnp.where(lam < 0, options.lambda_initial_factor * mean_diag, lam)

    # block elimination assumes the eliminated group is free; fall back to
    # the full-system solve when it is frozen
    if options.solver == "schur" and "points" not in options.freeze:
        delta, pcg_iters = schur_pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="points",
        )
    elif options.solver == "schur_poses" and "poses" not in options.freeze:
        delta, pcg_iters = schur_pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="poses",
        )
    elif options.solver == "schur_direct" and "poses" not in options.freeze:
        delta, pcg_iters = schur_direct_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="poses",
        )
    elif (options.solver == "schur_direct_points"
          and "points" not in options.freeze):
        delta, pcg_iters = schur_direct_solve(
            data, blocks, state, grad, block_diag, lam, mask, options,
            eliminate="points",
        )
    else:
        delta, pcg_iters = pcg_solve(
            data, blocks, state, grad, block_diag, lam, mask, options
        )
    test_state = apply_freeze(state, retract(state, delta), options.freeze)
    test_costs, test_valids, warm2 = total_cost(data, test_state, warm1, options)

    old_sum = jnp.asarray(0.0, state.points.dtype)
    new_sum = jnp.asarray(0.0, state.points.dtype)
    full_cost = jnp.asarray(0.0, state.points.dtype)
    new_full_cost = jnp.asarray(0.0, state.points.dtype)
    for ci, b in enumerate(blocks):
        joint = b.valid & test_valids[ci]
        old_sum = old_sum + jnp.sum(jnp.where(joint, b.cost, 0.0))
        new_sum = new_sum + jnp.sum(jnp.where(joint, test_costs[ci], 0.0))
        full_cost = full_cost + jnp.sum(b.cost)
        new_full_cost = new_full_cost + jnp.sum(test_costs[ci])
    accept = new_sum < old_sum

    state = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(accept, b_, a), state, test_state
    )
    warm = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(accept, b_, a), warm1, warm2
    )
    lam = jnp.maximum(jnp.where(accept, 0.5 * lam, 2.0 * lam), options.lambda_min)
    return (state, warm, lam, accept, full_cost, new_full_cost, pcg_iters,
            old_sum, new_sum)


import functools


# BAOptions fields read ONLY by the host driver loop (optimize()) or by
# host-side table preparation — never inside traced code.  Canonicalizing
# them before keying the jit caches lets every threshold/iteration-budget
# variant of an optimization share one trace and one compiled executable
# (measured: each needless variant cost ~3-14 s of retrace + executable
# load on the remote TPU runtime, per pyramid level).
_HOST_ONLY_FIELDS = dict(
    max_lm_iterations=0,
    cost_reduction_threshold=0.0,
    max_consecutive_rejects=0,
    debug_verify=False,
    table_layout="auto",
    grid_layout_max_expand=0.0,
    profile_dir=None,
    lm_steps_per_call=0,
)


def _graph_options(options: BAOptions) -> BAOptions:
    return dataclasses.replace(options, **_HOST_ONLY_FIELDS)


@functools.lru_cache(maxsize=64)
def _cached_lm_step(options: BAOptions):
    return jax.jit(
        lambda state, warm, lam, data: lm_step(state, warm, lam, data,
                                               options)
    )


def make_lm_step(options: BAOptions, jit: bool = True):
    """One-step LM callable.  The jitted form is cached per options so
    repeated optimize() calls (pyramid levels, tests) reuse traces and
    compiled executables instead of rebuilding a fresh jit wrapper."""
    if jit:
        return _cached_lm_step(_graph_options(options))
    return lambda state, warm, lam, data: lm_step(state, warm, lam, data,
                                                  options)


def make_lm_scan(options: BAOptions, n_steps: int, jit: bool = True):
    """K LM iterations fused into one jitted call via lax.scan.

    Amortizes per-dispatch latency (measured ~30 ms per call on the remote
    TPU runtime) across several iterations, and carries the
    residual/Jacobian block cache between iterations so each one runs a
    single projection/Jacobian sweep (see lm_step).  Returns
    (state, warm, lam, per-iteration stacked (accept, cost, new_cost,
    pcg_iters))."""

    def scanned(state, warm, lam, data):
        blocks0, warm = compute_blocks(data, state, warm, options)
        delta0 = zero_tangent(state)

        def body(carry, _):
            state, warm, lam, blocks, delta = carry
            (state, warm, lam, accept, cost, new_cost, iters,
             paired_old, paired_new, blocks, delta) = lm_step(
                state, warm, lam, data, options, blocks, prev_delta=delta)
            return (state, warm, lam, blocks, delta), (
                accept, cost, new_cost, iters, paired_old, paired_new)

        (state, warm, lam, _, _), outs = jax.lax.scan(
            body, (state, warm, lam, blocks0, delta0), None, length=n_steps
        )
        return state, warm, lam, outs

    return _cached_scan_jit(_graph_options(options), n_steps) if jit \
        else scanned


@functools.lru_cache(maxsize=64)
def _cached_scan_jit(options: BAOptions, n_steps: int):
    return jax.jit(make_lm_scan(options, n_steps, jit=False))


def maybe_grid_layout(data, state: BAState, options: BAOptions):
    """Re-lay per-camera tables into (M, P) grid layout when beneficial.

    Host-side, one-time: only applied to concrete (unsharded) tables; a
    caller that shards its own ``data`` converts before sharding.
    """
    from camera_calibration_tpu.ba.dataset import to_grid_layout

    if options.table_layout == "flat":
        return data
    m = state.rig_q_global.shape[0]
    p = state.points.shape[0]
    # The direct Schur solvers assemble the reduced system from the grid
    # table; they need the dense layout regardless of fill ratio (the
    # reduced-dim^2 memory they already commit to dwarfs the table pad).
    force = options.solver in ("schur_direct", "schur_direct_points")
    out = []
    for seg in data:
        if seg.grid_shape is not None:
            out.append(seg)
            continue
        n_valid = int(np.asarray(jnp.sum(seg.valid)))
        if force or m * p <= options.grid_layout_max_expand * max(n_valid, 1):
            out.append(to_grid_layout(seg, m, p))
        else:
            out.append(seg)
    return tuple(out)


def resolve_solver(options: BAOptions, state: BAState,
                   direct_max_reduced_dim: int = 2048) -> BAOptions:
    """Resolve solver="auto" to a concrete mode from the problem size.

    The reference's default SchurMode is Dense — eliminate the pose
    blocks and solve the reduced system directly (Readme.md:330-352,
    joint_optimization.cc:794-814) — because on small/medium problems
    the exact Newton step beats capped inexact CG by a wide margin in
    time-to-convergence (measured: the round-3 noncentral plateau needed
    140 capped-CG iterations vs 30 direct ones).  Memory for the reduced
    system grows as dim², so past ``direct_max_reduced_dim`` (32 MB f64
    at 2048) auto picks the Schur-PCG mode that scales.
    """
    if options.solver != "auto":
        return options
    n_intr = sum(
        int(np.prod(np.asarray(
            protocol_intrinsics_tangent_shape(m)
        )))
        for m in state.intrinsics
    )
    reduced = (
        state.points.shape[0] * 3 + state.cam_q_rig.shape[0] * 6 + n_intr
    )
    mode = "schur_direct" if reduced <= direct_max_reduced_dim else "schur"
    return dataclasses.replace(options, solver=mode)


def protocol_intrinsics_tangent_shape(model):
    from camera_calibration_tpu.models import protocol

    return protocol.intrinsics_tangent_zero(model).shape


def prewarm(state: BAState, data, options: BAOptions = BAOptions()):
    """AOT-prepare the LM step executable for this problem's shapes.

    Traces, lowers, and compiles (or loads from the persistent XLA
    cache) the exact executable a later ``optimize(state, ..., data=
    data, options=options)`` call will dispatch, without running any
    optimization.  On the remote TPU runtime each new shape costs
    ~3 s trace + ~10 s executable load; calling this from a background
    thread overlaps that with host-side pipeline phases (the analog of
    the reference being an ahead-of-time compiled binary).  Thread-safe;
    failures are swallowed — prewarming is only ever an optimization.
    """
    try:
        was_auto = options.solver == "auto"
        options = resolve_solver(options, state)
        data = maybe_grid_layout(data, state, options)
        if (was_auto and options.solver.startswith("schur_direct")
                and not all(seg.grid_shape is not None for seg in data)):
            options = dataclasses.replace(options, solver="schur")
        k = max(1, int(options.lm_steps_per_call))
        fn = make_lm_scan(options, k) if k > 1 else make_lm_step(options)
        warm = tuple(seg.pixel for seg in data)
        lam = jax.ShapeDtypeStruct((), np.dtype(state.points.dtype))
        fn.lower(state, warm, lam, data).compile()
    except Exception:  # pragma: no cover - diagnostics only
        import logging

        logging.getLogger(__name__).debug("prewarm failed", exc_info=True)


def optimize(
    state: BAState,
    obs,
    segments,
    options: BAOptions = BAOptions(),
    *,
    callback=None,
    data=None,
):
    """Run LM to convergence. Host loop drives the jitted step.

    obs+segments: camera-sorted ObservationTable + per-camera slices, or
    pass ``data`` (tuple of per-camera tables, possibly device-sharded)
    directly.  Returns (state, info dict).
    """
    from camera_calibration_tpu.ba.dataset import split_by_camera

    import contextlib
    import time

    was_auto = options.solver == "auto"
    options = resolve_solver(options, state)
    if data is None:
        data = split_by_camera(obs, segments)
        data = maybe_grid_layout(data, state, options)
    else:
        # Directly-passed tables get the same layout optimization, but
        # only when unsharded: a caller that sharded its own data chose
        # its layout (re-laying would gather to one device).
        def _unsharded(seg):
            return all(
                len(x.devices()) == 1
                for x in jax.tree_util.tree_leaves(seg)
                if hasattr(x, "devices")
            )

        if all(_unsharded(seg) for seg in data):
            data = maybe_grid_layout(data, state, options)
    if (was_auto and options.solver.startswith("schur_direct")
            and not all(seg.grid_shape is not None for seg in data)):
        # auto picked the direct solver, but the tables could not be laid
        # out in grid form (table_layout="flat", or caller-sharded data)
        # — fall back to the iterative mode rather than erroring
        options = dataclasses.replace(options, solver="schur")
    if options.debug_verify:
        verify_cost(state, data, options)
    k = max(1, int(options.lm_steps_per_call))
    if options.cg_warm_start and (
        k == 1 or options.solver.startswith("schur_direct")
    ):
        import warnings

        warnings.warn(
            "cg_warm_start=True has no effect: it needs the scan path "
            "(lm_steps_per_call > 1) and an iterative solver "
            f"(got lm_steps_per_call={k}, solver={options.solver!r}).",
            stacklevel=2,
        )
    if k > 1:
        scan_step = make_lm_scan(options, k)
    else:
        step = make_lm_step(options)
    warm = tuple(seg.pixel for seg in data)
    lam = jnp.asarray(-1.0, state.points.dtype)
    history = []
    rejects = 0
    final_cost = None
    it = 0
    stop = False
    report = OptimizationReport()
    t_run0 = time.perf_counter()
    profile_ctx = (
        jax.profiler.trace(options.profile_dir)
        if options.profile_dir
        else contextlib.nullcontext()
    )
    with profile_ctx:
        while it < options.max_lm_iterations and not stop:
            t0 = time.perf_counter()
            if k > 1:
                state, warm, lam, outs = scan_step(state, warm, lam, data)
                accepts, costs, new_costs, pcg_its = (
                    np.asarray(outs[0]), np.asarray(outs[1]),
                    np.asarray(outs[2]), np.asarray(outs[3]),
                )
                p_olds, p_news = np.asarray(outs[4]), np.asarray(outs[5])
                entries = [
                    (bool(accepts[i]), float(costs[i]), float(new_costs[i]),
                     int(pcg_its[i]), float(p_olds[i]), float(p_news[i]))
                    for i in range(k)
                ]
            else:
                (state, warm, lam, accept, cost, new_cost, pcg_iters,
                 p_old, p_new) = step(state, warm, lam, data)
                entries = [(bool(accept), float(cost), float(new_cost),
                            int(pcg_iters), float(p_old), float(p_new))]
            dt = time.perf_counter() - t0  # np/float conversions synced
            if report.iterations == 0:
                report.first_call_seconds = dt
            else:
                report.step_seconds += dt
            for accept, cost, new_cost, pcg_iters, p_old, p_new in entries:
                if it >= options.max_lm_iterations:
                    break
                history.append(
                    {
                        "iteration": it,
                        "cost": cost,
                        "new_cost": new_cost,
                        "paired_cost": p_old,
                        "paired_new_cost": p_new,
                        "accepted": accept,
                        "lambda": float(lam),
                        "pcg_iterations": pcg_iters,
                    }
                )
                if callback is not None:
                    callback(history[-1], state)
                it += 1
                report.iterations = it
                report.pcg_iterations_total += pcg_iters
                if np.isnan(report.initial_cost):
                    report.initial_cost = cost
                if accept:
                    report.accepted += 1
                    rejects = 0
                    # Convergence is judged on the PAIRED costs — the
                    # quantity the accept decision compares (reference's
                    # invalid-residual pairing, lm_optimizer.h:993-1011).
                    # The FULL cost can legitimately rise on an accepted
                    # step when the valid set shifts (a projection drops
                    # out); treating that as "no progress" stopped LM runs
                    # far from the optimum (round-3 noncentral plateau).
                    rel = (p_old - p_new) / max(p_old, 1e-30)
                    final_cost = new_cost
                    if rel < options.cost_reduction_threshold:
                        stop = True
                        break
                else:
                    report.rejected += 1
                    rejects += 1
                    final_cost = cost
                    if rejects >= options.max_consecutive_rejects:
                        stop = True
                        break
    report.final_cost = (
        float(final_cost) if final_cost is not None else float("nan")
    )
    report.total_seconds = time.perf_counter() - t_run0
    return state, {
        "history": history,
        "final_cost": final_cost,
        "report": report,
    }


def verify_cost(state, data, options: BAOptions, seed: int = 0):
    """Runtime numeric self-checks (the reference's VerifyCost /
    VerifyAnalyticalJacobian debug hooks, lm_optimizer.h:415-627).

    1. Determinism: the jitted cost evaluated twice must agree bitwise.
    2. Consistency: the cost assembled from the Jacobian-block pass must
       match the cost-only pass.
    3. Analytic-vs-finite-difference gradient along a random tangent
       direction (directional derivative of the UNWEIGHTED 0.5·Σ w r²
       Gauss-Newton model at the current weights).

    Returns a dict of measured discrepancies; raises AssertionError on
    gross failures.
    """
    import numpy as np_

    warm = tuple(seg.pixel for seg in data)

    cost_fn = jax.jit(
        lambda s, w: sum(
            jnp.sum(c) for c in total_cost(data, s, w, options)[0]
        )
    )
    c1 = float(cost_fn(state, warm))
    c2 = float(cost_fn(state, warm))
    assert c1 == c2, f"nondeterministic cost: {c1} vs {c2}"

    blocks_fn = jax.jit(
        lambda s, w: compute_blocks(data, s, w, options)
    )
    blocks, _ = blocks_fn(state, warm)
    c_blocks = float(sum(jnp.sum(b.cost) for b in blocks))
    rel_cost = abs(c_blocks - c1) / max(abs(c1), 1e-30)
    assert rel_cost < 1e-4, (
        f"block-pass cost {c_blocks} vs cost-pass {c1} (rel {rel_cost})"
    )

    # directional derivative check: d/dt [0.5 Σ w·r(t)²] at t=0 equals
    # Σ w·r·(J v) = <grad, v> with the IRLS weights frozen
    rng = np_.random.default_rng(seed)
    v = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(0, 1, x.shape), x.dtype
        ),
        zero_tangent(state),
    )
    mask = fix_gauge_mask(state, options.freeze)
    v = _masked(v, mask)
    scale = jnp.sqrt(_tree_dot(v, v))
    v = jax.tree_util.tree_map(lambda x: x / scale, v)
    grad = apply_jtw(data, blocks, [b.r for b in blocks], state)
    grad = _masked(grad, mask)
    analytic = float(_tree_dot(grad, v))

    def weighted_cost(s, w):
        costs = []
        for ci, seg in enumerate(data):
            # 0.5 Σ w_frozen · r² with the blocks' weights
            x = s.points[seg.point]
            from camera_calibration_tpu.ba.state import transform_to_camera
            from camera_calibration_tpu.models import protocol

            x_cam, _ = transform_to_camera(s, seg.imageset, seg.camera, x)
            px, _, pvalid = protocol.project_points(
                s.intrinsics[ci], x_cam, init_xy=w[ci],
                max_iterations=options.proj_iterations,
            )
            r = px - seg.pixel
            sq = jnp.sum(r * r, axis=-1)
            costs.append(0.5 * jnp.sum(blocks[ci].weight * sq))
        return sum(costs)

    wc = jax.jit(weighted_cost)
    eps = 1e-5 if state.points.dtype == jnp.float64 else 3e-3
    c_plus = float(wc(retract(state, jax.tree_util.tree_map(
        lambda x: eps * x, v)), warm))
    c_minus = float(wc(retract(state, jax.tree_util.tree_map(
        lambda x: -eps * x, v)), warm))
    fd = (c_plus - c_minus) / (2 * eps)
    denom = max(abs(analytic), abs(fd), 1e-12)
    rel_grad = abs(fd - analytic) / denom
    assert rel_grad < 5e-2, (
        f"gradient check failed: analytic {analytic} vs FD {fd} "
        f"(rel {rel_grad})"
    )
    return {
        "cost": c1,
        "cost_block_pass_rel_diff": rel_cost,
        "grad_analytic": analytic,
        "grad_fd": fd,
        "grad_rel_diff": rel_grad,
    }
