"""Pallas TPU kernel: fused batched B-spline surface evaluation.

Fuses what the XLA dense path (`bspline.eval_surface_dense_with_jac`)
does in several HBM-level ops — per-axis weight construction, the
(N,H)×(H,W·C) row contraction, and the per-point column reduction — into
one kernel: weights are built in VMEM per tile, the row contraction runs
on the MXU, and the value/derivative reductions happen in registers
without materializing (N,H)/(N,W) weight arrays or (N,W,C) row blocks in
HBM.

The control grid must fit comfortably in VMEM (true for calibration
grids: ≤ ~64×64×3 f32).  Used by the projection inner loop via
``camera_calibration_tpu.ops.bspline.set_eval_backend("pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights_and_derivs(t, derivative: bool):
    t2 = t * t
    t3 = t2 * t
    om = 1.0 - t
    if derivative:
        return (
            -(om * om) / 2.0,
            (9.0 * t2 - 12.0 * t) / 6.0,
            (-9.0 * t2 + 6.0 * t + 3.0) / 6.0,
            t2 / 2.0,
        )
    return (
        (om * om * om) / 6.0,
        (3.0 * t3 - 6.0 * t2 + 4.0) / 6.0,
        (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0) / 6.0,
        t3 / 6.0,
    )


def _dense_rows(g, size, derivative):
    """(T, size) weight rows for coordinates g (T,) — built in-register."""
    base = jnp.floor(g).astype(jnp.int32) - 1
    t = g - (base + 1).astype(g.dtype)
    w0, w1, w2, w3 = _weights_and_derivs(t, derivative)
    iota = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], size), 1)
    b = base[:, None]
    return (
        w0[:, None] * (iota == b)
        + w1[:, None] * (iota == b + 1)
        + w2[:, None] * (iota == b + 2)
        + w3[:, None] * (iota == b + 3)
    ).astype(g.dtype)


def _eval_kernel(gxy_ref, grid_ref, val_ref, jac_ref, *, gh, gw, c):
    # fully 2D ops (Mosaic rejects 3D<->2D shape casts): per-channel matmuls
    gx = gxy_ref[:, 0]
    gy = gxy_ref[:, 1]

    wy = _dense_rows(gy, gh, False)
    dwy = _dense_rows(gy, gh, True)
    wx = _dense_rows(gx, gw, False)
    dwx = _dense_rows(gx, gw, True)

    for ch in range(c):
        gch = grid_ref[:, :, ch]  # (H, W)
        rows = jnp.dot(wy, gch, preferred_element_type=jnp.float32)
        drows = jnp.dot(dwy, gch, preferred_element_type=jnp.float32)
        val_ref[:, ch] = jnp.sum(wx * rows, axis=1)
        jac_ref[:, 2 * ch] = jnp.sum(dwx * rows, axis=1)
        jac_ref[:, 2 * ch + 1] = jnp.sum(wx * drows, axis=1)


@functools.partial(jax.jit, static_argnames=("tile",))
def eval_surface_dense_with_jac_pallas(grid, gxy, tile: int = 1024):
    """Pallas version of bspline.eval_surface_dense_with_jac.

    grid: (H, W, C) float32; gxy: (N, 2) float32, N a multiple of `tile`
    (pad with in-range coords).  Returns (val (N, C), jac (N, C, 2)).
    """
    gh, gw, c = grid.shape
    n = gxy.shape[0]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    kernel = functools.partial(_eval_kernel, gh=gh, gw=gw, c=c)
    val, jac2 = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, gw, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c * 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), grid.dtype),
            jax.ShapeDtypeStruct((n, c * 2), grid.dtype),
        ],
    )(gxy, grid)
    return val, jac2.reshape(n, c, 2)
