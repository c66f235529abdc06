"""Multi-chip scaling: observation sharding over a device mesh.

The reference is a single-node, single-GPU tool (SURVEY §2.4) — this
subsystem is new, designed TPU-first: the natural scaling axis of
calibration is the number of observations/images, so the per-camera
observation tables are sharded along their observation axis over a 1-D
``jax.sharding.Mesh`` while the state (poses, points, intrinsics) is
replicated.  Under ``jit``, XLA GSPMD then turns every
``segment_sum``/reduction in the BA step (gradient, Jacobi diagonal, and
each PCG matvec) into partial sums + ``AllReduce`` over ICI — the
explicit psum plumbing a hand-written NCCL port would need simply does
not exist here.

Multi-host: initialize ``jax.distributed`` before calling these helpers
and use the global device list; the same sharding spec spans hosts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camera_calibration_tpu.ba.dataset import ObservationTable, pad_table


def make_mesh(devices=None, axis_name: str = "obs") -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def shard_observations(data, mesh: Mesh, axis_name: str = "obs"):
    """Shard per-camera tables along the observation axis (pads first)."""
    n_dev = mesh.devices.size
    row = NamedSharding(mesh, P(axis_name))
    row2 = NamedSharding(mesh, P(axis_name, None))

    out = []
    for seg in data:
        seg = pad_table(seg, n_dev)
        out.append(
            ObservationTable(
                imageset=jax.device_put(seg.imageset, row),
                camera=jax.device_put(seg.camera, row),
                point=jax.device_put(seg.point, row),
                pixel=jax.device_put(seg.pixel, row2),
                valid=jax.device_put(seg.valid, row),
                grid_shape=seg.grid_shape,
            )
        )
    return tuple(out)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (state, scalars) across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(tree, repl)


def shard_grid_blocks(state, mesh: Mesh, axis_name: str = "obs"):
    """Shard spline-grid intrinsics by grid rows across the mesh.

    The second scaling axis of calibration (north star: "partitioning
    images/observations AND grid blocks across hosts"): each device holds
    a band of grid-knot rows; the dense one-hot spline contractions and
    the per-knot preconditioner blocks are then computed on the owning
    device and GSPMD inserts the collectives.  Worthwhile for very large
    grids / many cameras; for typical ≤10k-parameter grids replication is
    usually faster — measure.  Non-grid (parametric) intrinsics are left
    replicated.
    """
    from camera_calibration_tpu.models import protocol

    from camera_calibration_tpu.models.base import replace

    rows = NamedSharding(mesh, P(axis_name, None, None))
    new_intr = []
    for m in state.intrinsics:
        if not protocol.is_grid_model(m):
            new_intr.append(jax.device_put(m, NamedSharding(mesh, P())))
            continue
        updates = {
            f: jax.device_put(getattr(m, f), rows)
            for f in ("grid", "direction_grid", "origin_grid")
            if hasattr(m, f)
        }
        new_intr.append(replace(m, **updates))
    import dataclasses as _dc

    return _dc.replace(state, intrinsics=tuple(new_intr))
