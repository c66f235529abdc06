"""Pallas TPU kernels for the grid-intrinsics window ops.

The CG inner loop's cost is dominated by the spline-window contractions
``intr_apply_j`` (J_intr·v), ``intr_apply_jtw`` (J_intrᵀW·s) and, once per
LM iteration, the per-knot blocks of diag(JᵀWJ).  All three share one
structure: per observation, 2·16·K Jacobian values interact with the 4×4
knot window at base (bx, by).

Kernel design — base-indicator correlation.  A direct one-hot formulation
needs a separate small contraction per window offset (~50 ops; each
becomes its own collective under sharding and a ~1.5%-utilized MXU pass
on chip).  Instead, every kernel builds ONE indicator of the window
*base* P[t, hb·gw + wb] = [hb==by][wb==bx] and runs ONE stacked matmul
against it; the (y, x) window-offset structure is recovered OUTSIDE the
kernel by shift-accumulating the tiny (F, gh·gw) result — 32 static
slice-adds on a 16×16 grid, negligible in XLA.  MXU shapes are
(F, t)@(t, 256)-class: full lanes, no 16-wide outputs.

f32 matmuls run 6 bf16 passes under the package's highest-precision
default; here each dot splits its f32 operand into bf16 hi + lo parts
and runs two single-pass dots (the indicator side is exactly
representable), giving f32-level accuracy (measured ≤4e-6 rel) at ~1/3
the passes.

Reference analog: the per-feature intrinsics rows of the fused CUDA PCG
kernels (reference: applications/camera_calibration/src/camera_calibration/
bundle_adjustment/cuda_joint_optimization.cu:610-742 PCGStep1 computes
J_i·p and J_iᵀ(W J_i·p) on the fly per feature).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT = jax.lax.Precision.DEFAULT


def window_pallas_enabled(dtype) -> bool:
    """Static switch: TPU-like backend + f32/bf16 (CPU tests run the XLA
    path; bf16 rows are the CG matvecs' half-bandwidth Jacobian cache)."""
    if os.environ.get("CCT_PALLAS", "1") == "0":
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    try:
        from camera_calibration_tpu.config import effective_backend

        return effective_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def _row_pad(gw):
    return -(-gw // 8) * 8


def _hilo_dot(a, b):
    """a @ b with a split into bf16 hi/lo parts (b exactly representable:
    0/1 indicators or pre-split operands).  Two single-pass MXU dots."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    lo = a - hi
    dn = (((1,), (0,)), ((), ()))
    return (
        jax.lax.dot_general(hi, b, dn, preferred_element_type=jnp.float32,
                            precision=_DEFAULT)
        + jax.lax.dot_general(lo, b, dn, preferred_element_type=jnp.float32,
                              precision=_DEFAULT)
    )



def _apply_jtw_kernel(jwin_ref, base_ref, ws_ref, out_ref, *, gh, gwp, k):
    """Accumulates M[f, hb·gwp+wb] = Σ_t c[f,t]·[hb==by][wb==bx] with
    c = jwin_x·ws0 + jwin_y·ws1; shift-combine happens on the XLA side."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    t = base_ref.shape[1]
    cells = gh * gwp
    bcomb = base_ref[1:2, :] * gwp + base_ref[0:1, :]  # (1, t): by·gwp+bx
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (t, cells), 1)
    p = jnp.where(iota_c == bcomb.T, 1.0, 0.0)  # (t, cells)
    jw = jwin_ref[...].astype(jnp.float32)  # bf16 rows upcast in VMEM
    c = (
        jw[: 16 * k, :] * ws_ref[0:1, :]
        + jw[16 * k:, :] * ws_ref[1:2, :]
    )  # (16k, t)
    out_ref[...] = out_ref[...] + _hilo_dot(c, p)


def _block_diag_kernel(jwin_ref, base_ref, w_ref, out_ref, *, gh, gwp, k):
    """Same correlation with c rows = w·(jx_j·jx_l + jy_j·jy_l) for the
    upper-triangular (j, l) pairs of each window offset."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    t = base_ref.shape[1]
    cells = gh * gwp
    bcomb = base_ref[1:2, :] * gwp + base_ref[0:1, :]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (t, cells), 1)
    p = jnp.where(iota_c == bcomb.T, 1.0, 0.0)
    wrow = w_ref[0:1, :]
    jw = jwin_ref[...].astype(jnp.float32)
    rows = []
    for y in range(4):
        for x in range(4):
            for j in range(k):
                fj = (y * 4 + x) * k + j
                for l in range(j, k):
                    fl = (y * 4 + x) * k + l
                    rows.append(
                        (
                            jw[fj:fj + 1, :] * jw[fl:fl + 1, :]
                            + jw[16 * k + fj:16 * k + fj + 1, :]
                            * jw[16 * k + fl:16 * k + fl + 1, :]
                        )
                        * wrow
                    )
    c = jnp.concatenate(rows, axis=0)  # (16·k(k+1)/2, t)
    out_ref[...] = out_ref[...] + _hilo_dot(c, p)


def _apply_j_kernel(jwin_ref, base_ref, ts_hi_ref, ts_lo_ref, out_ref, *,
                    gh, gwp, k):
    """J_intr·v: M2[f, t] = Σ_cells TS[f, cell]·Pᵀ[cell, t] gathers each
    observation's shifted tangent window value; the output rows are then
    VPU row-dots against the Jacobian rows."""
    t = base_ref.shape[1]
    cells = gh * gwp
    bcomb = base_ref[1:2, :] * gwp + base_ref[0:1, :]  # (1, t)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (cells, t), 0)
    p_t = jnp.where(iota_r == bcomb, 1.0, 0.0)  # (cells, t)
    dn = (((1,), (0,)), ((), ()))
    m2 = (
        jax.lax.dot_general(ts_hi_ref[...], p_t, dn,
                            preferred_element_type=jnp.float32,
                            precision=_DEFAULT)
        + jax.lax.dot_general(ts_lo_ref[...], p_t, dn,
                              preferred_element_type=jnp.float32,
                              precision=_DEFAULT)
    )  # (16k, t)
    jw = jwin_ref[...].astype(jnp.float32)
    out_ref[0:1, :] = jnp.sum(jw[: 16 * k, :] * m2, axis=0, keepdims=True)
    out_ref[1:2, :] = jnp.sum(jw[16 * k:, :] * m2, axis=0, keepdims=True)


def _pad_cols(a, n_pad, fill=0.0):
    n = a.shape[1]
    if n == n_pad:
        return a
    return jnp.pad(a, ((0, 0), (0, n_pad - n)), constant_values=fill)



@functools.partial(jax.jit, static_argnames=("k", "tile", "gh", "gwp"))
def _apply_j_call(jwin, base_t, ts_hi, ts_lo, k: int, tile: int, gh: int,
                  gwp: int):
    n = jwin.shape[1]
    cells = gh * gwp
    kernel = functools.partial(_apply_j_kernel, gh=gh, gwp=gwp, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((2 * 16 * k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * k, cells), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * k, cells), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
    )(jwin, base_t, ts_hi, ts_lo)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile", "gh", "gwp"))
def _apply_jtw_call(jwin, base_t, ws_t, k: int, tile: int, gh: int,
                    gwp: int):
    n = jwin.shape[1]
    cells = gh * gwp
    kernel = functools.partial(_apply_jtw_kernel, gh=gh, gwp=gwp, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((2 * 16 * k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * k, cells), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16 * k, cells), jnp.float32),
    )(jwin, base_t, ws_t)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile", "gh", "gwp"))
def _block_diag_call(jwin, base_t, w_t, k: int, tile: int, gh: int,
                     gwp: int):
    n = jwin.shape[1]
    cells = gh * gwp
    kk2 = k * (k + 1) // 2
    kernel = functools.partial(_block_diag_kernel, gh=gh, gwp=gwp, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((2 * 16 * k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * kk2, cells), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16 * kk2, cells), jnp.float32),
    )(jwin, base_t, w_t)
    return out


_TILE = 2048


def window_apply_j(j_win, base_xy, tangent_intr):
    """J_intr·v as one Pallas launch.  Returns (n, 2)."""
    gh, gw, k = tangent_intr.shape
    gwp = _row_pad(gw)
    n = j_win.shape[1]
    n_pad = -(-n // _TILE) * _TILE
    jwin_p = _pad_cols(j_win, n_pad)
    base_p = _pad_cols(base_xy.T.astype(jnp.int32), n_pad)
    # TS[f=(y,x,j), hb·gwp + wb] = tangent[hb+y, wb+x, j] (zero padded)
    tp = jnp.pad(
        tangent_intr.astype(jnp.float32), ((0, 3), (0, 3 + gwp - gw), (0, 0))
    )
    rows = []
    for y in range(4):
        for x in range(4):
            for j in range(k):
                rows.append(tp[y:y + gh, x:x + gwp, j].reshape(gh * gwp))
    ts = jnp.stack(rows, axis=0)  # (16k, gh·gwp)
    ts_hi = ts.astype(jnp.bfloat16).astype(jnp.float32)
    ts_lo = ts - ts_hi
    if jwin_p.dtype != jnp.bfloat16:
        jwin_p = jwin_p.astype(jnp.float32)
    out = _apply_j_call(
        jwin_p, base_p, ts_hi, ts_lo, k, _TILE, gh, gwp
    )
    return out[:, :n].T


def _shift_accumulate(planes, gh, gw, slot_yx):
    """planes (F, gh, gw) → Σ_f shift(plane_f by (y_f, x_f)) grouped by
    slot: returns dict slot -> (gh, gw)."""
    acc = {}
    for fi, (y, x, slot) in enumerate(slot_yx):
        pl_ = planes[fi]
        cur = acc.get(slot)
        if cur is None:
            cur = jnp.zeros((gh, gw), pl_.dtype)
        cur = cur.at[y:, x:].add(pl_[: gh - y, : gw - x])
        acc[slot] = cur
    return acc


def window_apply_jtw(j_win, base_xy, ws, gh, gw, k):
    """J_intrᵀ(W·s) scattered into (gh, gw, k) as one Pallas launch."""
    n = j_win.shape[1]
    gwp = _row_pad(gw)
    n_pad = -(-n // _TILE) * _TILE
    jwin_p = _pad_cols(j_win, n_pad)
    base_p = _pad_cols(base_xy.T.astype(jnp.int32), n_pad)
    ws_p = _pad_cols(ws.T.astype(jnp.float32), n_pad)
    if jwin_p.dtype != jnp.bfloat16:
        jwin_p = jwin_p.astype(jnp.float32)
    m = _apply_jtw_call(
        jwin_p, base_p, ws_p, k, _TILE, gh, gwp
    )
    planes = m.reshape(16 * k, gh, gwp)[:, :, :gw]
    slot_yx = [
        (y, x, j) for y in range(4) for x in range(4) for j in range(k)
    ]
    acc = _shift_accumulate(planes, gh, gw, slot_yx)
    return jnp.stack([acc[j] for j in range(k)], axis=-1)


def window_block_diag(j_win, base_xy, w, gh, gw, k):
    """Per-knot K×K diag(JᵀWJ) blocks as one Pallas launch: (gh, gw, k, k)."""
    n = j_win.shape[1]
    gwp = _row_pad(gw)
    n_pad = -(-n // _TILE) * _TILE
    jwin_p = _pad_cols(j_win, n_pad)
    base_p = _pad_cols(base_xy.T.astype(jnp.int32), n_pad)
    w_p = _pad_cols(w[None, :].astype(jnp.float32), n_pad)
    if jwin_p.dtype != jnp.bfloat16:
        jwin_p = jwin_p.astype(jnp.float32)
    m = _block_diag_call(
        jwin_p, base_p, w_p, k, _TILE, gh, gwp
    )
    kk2 = k * (k + 1) // 2
    planes = m.reshape(16 * kk2, gh, gwp)[:, :, :gw]
    slot_yx = []
    for y in range(4):
        for x in range(4):
            for j in range(k):
                for l in range(j, k):
                    slot_yx.append((y, x, (j, l)))
    acc = _shift_accumulate(planes, gh, gw, slot_yx)
    blocks = jnp.zeros((gh, gw, k, k), jnp.float32)
    for (j, l), blk in acc.items():
        blocks = blocks.at[:, :, j, l].add(blk)
        if l != j:
            blocks = blocks.at[:, :, l, j].add(blk)
    return blocks
