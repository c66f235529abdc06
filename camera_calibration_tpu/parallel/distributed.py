"""Multi-host distribution helpers (jax.distributed).

The reference is single-process (SURVEY §5: no communication backend);
this subsystem is TPU-native by design.  The recipe:

1. every host calls :func:`initialize` (env-var driven on TPU pods, or
   explicit coordinator address for CPU/GPU clusters);
2. build a global mesh over ``jax.devices()`` (all hosts' devices) with
   :func:`global_mesh`;
3. each host feeds its LOCAL slice of the observation tables through
   :func:`shard_observations_multihost` — the result is a globally-sharded
   jax.Array; state stays replicated;
4. the jitted BA step is unchanged: XLA GSPMD inserts the cross-host
   collectives (AllReduce over ICI within a slice, DCN across slices).

A 2-process CPU-mesh version of this path runs in CI
(tests/test_multiprocess.py) so the multi-host logic is exercised without
a pod.
"""

from __future__ import annotations

import os

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Initialize jax.distributed (no-op when single-process).

    On TPU pods all arguments come from the environment automatically; on
    CPU/GPU pass them explicitly (or via JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(axis_name: str = "obs"):
    """1-D mesh over the GLOBAL device list (all hosts)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def shard_observations_multihost(local_data, mesh, axis_name: str = "obs"):
    """Build globally-sharded observation tables from per-host local rows.

    local_data: tuple of per-camera ObservationTable holding THIS host's
    rows (each host contributes its own slice; row counts must be equal
    across hosts per camera — pad locally first).  Returns tables whose
    arrays are global jax.Arrays sharded along the observation axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from camera_calibration_tpu.ba.dataset import ObservationTable, pad_table

    n_local = len(mesh.local_devices)
    out = []
    for seg in local_data:
        seg = pad_table(seg, n_local)

        def to_global(x, spec):
            sharding = NamedSharding(mesh, spec)
            n_rows_global = x.shape[0] * mesh.devices.size // n_local
            global_shape = (n_rows_global,) + x.shape[1:]
            per_dev = np.split(np.asarray(x), n_local, axis=0)
            arrays = [
                jax.device_put(chunk, d)
                for chunk, d in zip(per_dev, mesh.local_devices)
            ]
            return jax.make_array_from_single_device_arrays(
                global_shape, sharding, arrays
            )

        row = P(axis_name)
        row2 = P(axis_name, None)
        out.append(ObservationTable(
            imageset=to_global(seg.imageset, row),
            camera=to_global(seg.camera, row),
            point=to_global(seg.point, row),
            pixel=to_global(seg.pixel, row2),
            valid=to_global(seg.valid, row),
            grid_shape=seg.grid_shape,
        ))
    return tuple(out)


def replicate_multihost(tree, mesh):
    """Replicate a pytree across all hosts' devices (every host must pass
    the same values)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        arrays = [jax.device_put(x, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(
            x.shape, repl, arrays
        )

    return jax.tree_util.tree_map(put, tree)
