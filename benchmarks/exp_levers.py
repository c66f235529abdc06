"""Experiment: projection-iteration count and CG warm-start levers.

Measures LM iter/s AND converged cost on the standard bench problem for a
sweep of option settings, to decide whether the per-iteration projection
LM count can drop under warm starts and whether warm-starting CG across
LM iterations pays for its extra matvec.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_bench_problem
from camera_calibration_tpu.ba import lm_pcg
from camera_calibration_tpu import config as _cctpu_config

_cctpu_config.configure_compilation_cache(entry_point=True)


def run_config(state, data, label, n_scan=10, n_calls=2, **opt_kw):
    kw = dict(max_pcg_iterations=20, proj_iterations=8,
              lm_steps_per_call=n_scan)
    kw.update(opt_kw)
    options = lm_pcg.BAOptions(**kw)
    step = lm_pcg.make_lm_scan(options, n_scan)
    warm = tuple(s.pixel for s in data)
    lam = jnp.asarray(-1.0, jnp.float32)

    out = step(state, warm, lam, data)
    jax.block_until_ready(out)
    state_c, warm_c, lam_c, outs0 = out
    # convergence fidelity: cost trajectory of the first scan call
    traj = [np.asarray(outs0[2])]
    pcg0 = np.asarray(outs0[3])

    s, wm, lm = state_c, warm_c, lam_c
    t0 = time.perf_counter()
    for _ in range(n_calls):
        s, wm, lm, outs = step(s, wm, lm, data)
        traj.append(np.asarray(outs[2]))
    float(s.points.sum())
    t1 = time.perf_counter()
    iters_per_s = n_calls * n_scan / (t1 - t0)
    traj = np.concatenate(traj)
    with np.printoptions(precision=3, suppress=False, linewidth=200):
        print(f"{label:36s} {iters_per_s:7.2f} it/s  "
              f"cost@10={traj[9]:.6g} cost@30={traj[-1]:.6g}  "
              f"pcg0={pcg0.tolist()}")
        print(f"    traj={traj}")
    return iters_per_s


def main():
    state, data, meta = make_bench_problem()
    print(f"bench problem: {meta['n_obs']} obs")
    run_config(state, data, "control proj=8")
    run_config(state, data, "proj=4", proj_iterations=4)
    run_config(state, data, "warm(rej0) + proj=4", cg_warm_start=True,
               proj_iterations=4)
    run_config(state, data, "warm(rej0) + proj=4 tol.01",
               cg_warm_start=True, proj_iterations=4,
               pcg_rel_tolerance=0.01)


if __name__ == "__main__":
    main()
