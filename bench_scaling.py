"""Virtual-mesh scaling measurement (CPU; run as a subprocess of bench.py).

Real multi-chip hardware is not attached, so GSPMD partitioning quality is
measured on a virtual 8-device CPU mesh sharing the host's fixed cores:

- strong form: one jitted LM step on the SAME problem, 1 device vs
  sharded over 8 virtual devices.  With fixed compute resources an
  overhead-free partitioning gives a ratio t1/t8 of ~1.0; >1.0 means the
  8-way partitioned program uses the cores better than XLA:CPU's
  intra-op threading of the unsharded program (observed after batching
  the window contractions: every extra contraction over the sharded
  observation axis is an extra collective, so collective count per CG
  matvec is the lever).
- weak form: an 8x-observations problem sharded over 8 devices vs the
  1x problem on 1 device; ideal = 8·t1, matching the north-star claim
  shape ("500+ images sharded across hosts").

Both are proxies for ICI scaling: they expose partitioning/collective
overhead, not interconnect bandwidth.  Prints one JSON line.
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

    mesh = sharding.make_mesh(jax.devices()[:8])

    def sharded(state_, data_):
        data_sh = sharding.shard_observations(data_, mesh)
        state_sh = sharding.replicate(state_, mesh)
        return (
            state_sh,
            tuple(s.pixel for s in data_sh),
            sharding.replicate(lam, mesh),
            data_sh,
        )

    state, data = ge._make_problem(
        w=640, h=480, gres=16, n_points=512, n_poses=96, n_cameras=1
    )
    warm = tuple(s.pixel for s in data)
    t1 = time_step(state, warm, lam, data)
    t8 = time_step(*sharded(state, data))

    state_w, data_w = ge._make_problem(
        w=640, h=480, gres=16, n_points=512, n_poses=768, n_cameras=1
    )
    t8_weak = time_step(*sharded(state_w, data_w))

    print(json.dumps({
        "t_1dev_s": round(t1, 4),
        "t_8dev_s": round(t8, 4),
        "t_8dev_8x_obs_s": round(t8_weak, 4),
        "gspmd_efficiency": round(t1 / t8, 3),
        "gspmd_weak_efficiency": round(8 * t1 / t8_weak, 3),
    }))


if __name__ == "__main__":
    main()
