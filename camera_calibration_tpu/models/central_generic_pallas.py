"""Pallas TPU kernel: fused CentralGeneric projection (full LM loop).

The batched projection (models/central_generic.project_directions) is the
hot inner solver of bundle adjustment: each LM iteration evaluates the
spline surface twice over all points (Jacobian pass + test-cost pass),
which under XLA costs one HBM round trip per pass.  This kernel keeps the
control grid and a tile of points resident in VMEM and runs the *entire*
LM iteration loop in one kernel — weights are built in registers, the
row contractions hit the MXU, and the λ-damped 2×2 solve/accept logic is
pure VPU math, eliminating all intermediate HBM traffic.

Constraints: grid must fit VMEM (calibration grids do) and all tensors
stay 2D in-kernel (Mosaic rejects 3D↔2D shape casts, so channels are
unrolled).

STATUS: experimental — correct under the Pallas interpreter, but the
current remote Mosaic toolchain crashes compiling the fused LM loop
(helper exits without a diagnostic; the standalone spline-eval kernel in
ops/bspline_pallas.py does compile).  Not wired into the default path;
revisit with a local toolchain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_rows(g, size, derivative):
    """(T, size) dense cubic-weight rows for g (T, 1); all ≥2D ops."""
    base = jnp.floor(g).astype(jnp.int32) - 1  # (T, 1)
    t = g - (base + 1).astype(g.dtype)  # (T, 1)
    t2 = t * t
    t3 = t2 * t
    om = 1.0 - t
    if derivative:
        w0 = -(om * om) / 2.0
        w1 = (9.0 * t2 - 12.0 * t) / 6.0
        w2 = (-9.0 * t2 + 6.0 * t + 3.0) / 6.0
        w3 = t2 / 2.0
    else:
        w0 = (om * om * om) / 6.0
        w1 = (3.0 * t3 - 6.0 * t2 + 4.0) / 6.0
        w2 = (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0) / 6.0
        w3 = t3 / 6.0
    iota = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], size), 1)
    return (
        w0 * (iota == base)
        + w1 * (iota == base + 1)
        + w2 * (iota == base + 2)
        + w3 * (iota == base + 3)
    ).astype(g.dtype)


def _project_kernel(dirs_ref, g0_ref, gx_ref, gy_ref, gz_ref, gout_ref,
                    cost_ref, *, gh, gw, lo_x, lo_y, hi_x, hi_y, iters, eps):
    # all per-point quantities are (T, 1) columns (Mosaic wants ≥2D)
    dx = dirs_ref[:, 0:1]
    dy = dirs_ref[:, 1:2]
    dz = dirs_ref[:, 2:3]
    t = dx.shape[0]

    def eval_u(gx, gy, with_derivs):
        wy = _axis_rows(gy, gh, False)
        wx = _axis_rows(gx, gw, False)
        outs = []
        douts = []
        if with_derivs:
            dwy = _axis_rows(gy, gh, True)
            dwx = _axis_rows(gx, gw, True)
        for gch_ref in (gx_ref, gy_ref, gz_ref):
            gch = gch_ref[:]
            rows = jnp.dot(wy, gch, preferred_element_type=jnp.float32)
            outs.append(jnp.sum(wx * rows, axis=1, keepdims=True))
            if with_derivs:
                drows = jnp.dot(dwy, gch, preferred_element_type=jnp.float32)
                douts.append(
                    (
                        jnp.sum(dwx * rows, axis=1, keepdims=True),
                        jnp.sum(wx * drows, axis=1, keepdims=True),
                    )
                )
        return outs, douts

    def cost_at(gx, gy):
        (ux, uy, uz), _ = eval_u(gx, gy, False)
        inv = jax.lax.rsqrt(ux * ux + uy * uy + uz * uz)
        rx = ux * inv - dx
        ry = uy * inv - dy
        rz = uz * inv - dz
        return rx * rx + ry * ry + rz * rz

    def body(_, carry):
        gx, gy, lam, done = carry
        (ux, uy, uz), d = eval_u(gx, gy, True)
        norm2 = ux * ux + uy * uy + uz * uz
        inv = jax.lax.rsqrt(norm2)
        nx = ux * inv
        ny = uy * inv
        nz = uz * inv
        rx = nx - dx
        ry = ny - dy
        rz = nz - dz
        cost = rx * rx + ry * ry + rz * rz
        # J = (I − n nᵀ)·du / |u| per column
        (duxx, duxy) = d[0]
        (duyx, duyy) = d[1]
        (duzx, duzy) = d[2]
        sx = nx * duxx + ny * duyx + nz * duzx
        sy = nx * duxy + ny * duyy + nz * duzy
        jxx = (duxx - nx * sx) * inv
        jyx = (duyx - ny * sx) * inv
        jzx = (duzx - nz * sx) * inv
        jxy = (duxy - nx * sy) * inv
        jyy = (duyy - ny * sy) * inv
        jzy = (duzy - nz * sy) * inv
        h00 = jxx * jxx + jyx * jyx + jzx * jzx
        h11 = jxy * jxy + jyy * jyy + jzy * jzy
        h01 = jxx * jxy + jyx * jyy + jzx * jzy
        b0 = jxx * rx + jyx * ry + jzx * rz
        b1 = jxy * rx + jyy * ry + jzy * rz
        lam = jnp.where(lam < 0, 0.01 * 0.5 * (h00 + h11), lam)
        a00 = h00 + lam
        a11 = h11 + lam
        det = a00 * a11 - h01 * h01
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        s0 = (a11 * b0 - h01 * b1) / det
        s1 = (a00 * b1 - h01 * b0) / det
        gx_t = jnp.clip(gx - s0, lo_x, hi_x)
        gy_t = jnp.clip(gy - s1, lo_y, hi_y)
        cost_t = cost_at(gx_t, gy_t)
        # float masks instead of bool vectors (Mosaic-friendly)
        accept = jnp.where(cost_t < cost, 1.0 - done, 0.0)
        gx = gx + accept * (gx_t - gx)
        gy = gy + accept * (gy_t - gy)
        lam = lam * jnp.where(accept > 0.5, 0.5, 2.0)
        done = jnp.maximum(done, jnp.where(cost < eps, 1.0, 0.0))
        return gx, gy, lam, done

    gx0 = g0_ref[:, 0:1]
    gy0 = g0_ref[:, 1:2]
    lam0 = jnp.full((t, 1), -1.0, dx.dtype)
    done0 = jnp.zeros((t, 1), dx.dtype)
    gx, gy, lam, done = jax.lax.fori_loop(
        0, iters, body, (gx0, gy0, lam0, done0)
    )
    gout_ref[:, 0:1] = gx
    gout_ref[:, 1:2] = gy
    cost_ref[:, 0:1] = cost_at(gx, gy)


@functools.partial(
    jax.jit,
    static_argnames=("lo", "hi", "max_iterations", "eps", "tile"),
)
def project_grid_coords_pallas(
    grid, dirs, init_g, lo, hi, max_iterations=10, eps=1e-10, tile=2048
):
    """Fused LM projection. Returns (grid coords (N,2), final cost (N,)).

    grid (H,W,3) f32 (VMEM-resident); dirs (N,3) unit; init_g (N,2) grid
    coords; lo/hi: static clamp bounds (tuples).  N must be a multiple of
    `tile`.
    """
    gh, gw, _ = grid.shape
    n = dirs.shape[0]
    assert n % tile == 0, f"N={n} not a multiple of tile={tile}"
    kernel = functools.partial(
        _project_kernel,
        gh=gh, gw=gw,
        lo_x=float(lo[0]), lo_y=float(lo[1]),
        hi_x=float(hi[0]), hi_y=float(hi[1]),
        iters=int(max_iterations), eps=float(eps),
    )
    g_out, cost = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), grid.dtype),
            jax.ShapeDtypeStruct((n, 1), grid.dtype),
        ],
    )(dirs, init_g, grid[:, :, 0], grid[:, :, 1], grid[:, :, 2])
    return g_out, cost[:, 0]
