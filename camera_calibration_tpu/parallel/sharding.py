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
