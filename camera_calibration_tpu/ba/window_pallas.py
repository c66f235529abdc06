"""Pallas TPU kernels for the grid-intrinsics window matvec pair.

The CG inner loop's cost is dominated by the spline-window contractions
``intr_apply_j`` (J_intr·v) and ``intr_apply_jtw`` (J_intrᵀW·s): the XLA
forms are ~50 small one-hot matmul/elementwise ops that each round-trip
(n, 16)-sized intermediates through HBM.  These kernels read the (2·16·K, n)
window-Jacobian rows once per tile and keep everything else (the K-channel
tangent planes / the (gh, gw, K) accumulator) resident in VMEM — the same
lane-major doctrine as models/central_generic_pallas.py: the observation
index lives on the LANE axis, every per-observation quantity is a (1, T)
row, all in-kernel tensors are strictly 2-D, channels/offsets unrolled.

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


def window_pallas_enabled(dtype) -> bool:
    """Static switch: TPU-like backend + f32 (CPU tests run the XLA path)."""
    if os.environ.get("CCT_PALLAS", "1") == "0":
        return False
    if dtype != jnp.float32:
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def _row_pad(gw):
    return -(-gw // 8) * 8


def _tangent_planes_t(tangent):
    """(gh, gw, K) tangent → (K·gwp, gh) stacked transposed planes."""
    gh, gw, k = tangent.shape
    gwp = _row_pad(gw)
    pad = ((0, gwp - gw), (0, 0))
    return jnp.concatenate(
        [jnp.pad(tangent[:, :, j].T, pad) for j in range(k)], axis=0
    )


def _apply_j_kernel(jwin_ref, base_ref, tpl_ref, out_ref, *, gh, gwp, k):
    t = base_ref.shape[1]
    bxi = base_ref[0:1, :]
    byi = base_ref[1:2, :]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (gh, t), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (gwp, t), 0)
    out0 = jnp.zeros((1, t), jnp.float32)
    out1 = jnp.zeros((1, t), jnp.float32)
    for y in range(4):
        oy = jnp.where(iota_h == byi + y, 1.0, 0.0)  # (gh, t)
        rows = [
            jnp.dot(
                tpl_ref[j * gwp:(j + 1) * gwp, :], oy,
                preferred_element_type=jnp.float32,
            )
            for j in range(k)
        ]  # K × (gwp, t): tangent rows at (by+y, :, j) per observation
        for x in range(4):
            oxm = jnp.where(iota_w == bxi + x, 1.0, 0.0)
            for j in range(k):
                val = jnp.sum(oxm * rows[j], axis=0, keepdims=True)
                f = (y * 4 + x) * k + j
                out0 = out0 + jwin_ref[f:f + 1, :] * val
                out1 = out1 + jwin_ref[16 * k + f:16 * k + f + 1, :] * val
    out_ref[0:1, :] = out0
    out_ref[1:2, :] = out1


def _apply_jtw_kernel(jwin_ref, base_ref, ws_ref, out_ref, *, gh, gwp, k):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    t = base_ref.shape[1]
    bxi = base_ref[0:1, :]
    byi = base_ref[1:2, :]
    ws0 = ws_ref[0:1, :]
    ws1 = ws_ref[1:2, :]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (gh, t), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (gwp, t), 0)
    dn = (((1,), (1,)), ((), ()))  # contract the lane (observation) axis
    for y in range(4):
        oy = jnp.where(iota_h == byi + y, 1.0, 0.0)  # (gh, t)
        for x in range(4):
            oxm = jnp.where(iota_w == bxi + x, 1.0, 0.0)  # (gwp, t)
            for j in range(k):
                f = (y * 4 + x) * k + j
                c = (
                    jwin_ref[f:f + 1, :] * ws0
                    + jwin_ref[16 * k + f:16 * k + f + 1, :] * ws1
                )  # (1, t)
                blk = jax.lax.dot_general(
                    oy * c, oxm, dn, preferred_element_type=jnp.float32
                )  # (gh, gwp)
                out_ref[j * gh:(j + 1) * gh, :] = (
                    out_ref[j * gh:(j + 1) * gh, :] + blk
                )


def _pad_cols(a, n_pad, fill=0.0):
    n = a.shape[1]
    if n == n_pad:
        return a
    return jnp.pad(a, ((0, 0), (0, n_pad - n)), constant_values=fill)


@functools.partial(jax.jit, static_argnames=("k", "tile", "gh"))
def _apply_j_call(jwin, base_t, tplanes, k: int, tile: int, gh: int):
    gwp = tplanes.shape[0] // k
    n = jwin.shape[1]
    kernel = functools.partial(_apply_j_kernel, gh=gh, gwp=gwp, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((2 * 16 * k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * gwp, gh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
    )(jwin, base_t, tplanes)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile", "gh", "gwp"))
def _apply_jtw_call(jwin, base_t, ws_t, k: int, tile: int, gh: int,
                    gwp: int):
    n = jwin.shape[1]
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
        out_specs=pl.BlockSpec((k * gh, gwp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * gh, gwp), jnp.float32),
    )(jwin, base_t, ws_t)
    return out


_TILE = 2048


def window_apply_j(j_win, base_xy, tangent_intr):
    """J_intr·v as one Pallas launch.  Returns (n, 2)."""
    gh, gw, k = tangent_intr.shape
    n = j_win.shape[1]
    n_pad = -(-n // _TILE) * _TILE
    jwin_p = _pad_cols(j_win, n_pad)
    base_p = _pad_cols(base_xy.T.astype(jnp.int32), n_pad)
    tpl = _tangent_planes_t(tangent_intr.astype(jnp.float32))
    out = _apply_j_call(
        jwin_p.astype(jnp.float32), base_p, tpl, k, _TILE, gh
    )
    return out[:, :n].T


def window_apply_jtw(j_win, base_xy, ws, gh, gw, k):
    """J_intrᵀ(W·s) scattered into (gh, gw, k) as one Pallas launch."""
    n = j_win.shape[1]
    gwp = _row_pad(gw)
    n_pad = -(-n // _TILE) * _TILE
    jwin_p = _pad_cols(j_win, n_pad)
    base_p = _pad_cols(base_xy.T.astype(jnp.int32), n_pad)
    ws_p = _pad_cols(ws.T.astype(jnp.float32), n_pad)
    out = _apply_jtw_call(
        jwin_p.astype(jnp.float32), base_p, ws_p, k, _TILE, gh, gwp
    )
    # (k*gh, gwp) planes → (gh, gw, k)
    planes = out.reshape(k, gh, gwp)[:, :, :gw]
    return jnp.transpose(planes, (1, 2, 0))