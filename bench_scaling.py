"""Virtual-mesh scaling measurement (CPU; run as a subprocess of bench.py).

Measures one jitted LM step's wall time on 1 CPU device vs sharded over 8
virtual CPU devices (same physical cores).  With fixed compute resources,
perfect GSPMD partitioning gives a ratio of 1.0; the reported efficiency
= t(1 dev) / t(8 dev) quantifies the overhead XLA's partitioner +
collectives add to the sharded program — the CI-measurable proxy for
multi-chip scaling quality while only one real TPU chip is attached.
Prints one JSON line.
"""

import json
import os
import sys
import time


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from camera_calibration_tpu.ba import lm_pcg
    from camera_calibration_tpu.parallel import sharding

    state, data = ge._make_problem(
        w=640, h=480, gres=16, n_points=512, n_poses=96, n_cameras=1
    )
    options = lm_pcg.BAOptions(max_pcg_iterations=10, proj_iterations=6)
    step = lm_pcg.make_lm_step(options)
    lam = jnp.asarray(1.0, jnp.float32)

    def time_step(state_, warm_, lam_, data_):
        out = step(state_, warm_, lam_, data_)
        jax.block_until_ready(out)
        ts = []
        for _ in range(6):  # min of 6: the shared-core timing is noisy
            t0 = time.perf_counter()
            out = step(state_, warm_, lam_, data_)
            float(out[4])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    warm = tuple(s.pixel for s in data)
    t1 = time_step(state, warm, lam, data)

    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state, mesh)
    warm_sh = tuple(s.pixel for s in data_sh)
    lam_sh = sharding.replicate(lam, mesh)
    t8 = time_step(state_sh, warm_sh, lam_sh, data_sh)

    print(json.dumps({
        "t_1dev_s": round(t1, 4),
        "t_8dev_s": round(t8, 4),
        "gspmd_efficiency": round(t1 / t8, 3),
    }))


if __name__ == "__main__":
    main()
