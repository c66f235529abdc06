"""2-process multi-host test on a CPU mesh.

Launches two coordinated processes (jax.distributed, 4 forced host
devices each → one 8-device global mesh) and runs one sharded BA LM step;
the result must match the single-process 8-device run bit-for-cost.
This exercises the real multi-host code path (global arrays built from
per-host shards, cross-process AllReduce) without TPU pod hardware —
SURVEY §4's "multi-node tests via a CPU mesh" tier.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

proc_id = int(sys.argv[1])
coord = sys.argv[2]

from camera_calibration_tpu.parallel import distributed as dist

dist.initialize(coordinator_address=coord, num_processes=2,
                process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

# Establish the cross-process Gloo context IMMEDIATELY with a trivial
# collective: everything after this point (problem construction, the
# LM-step compile) takes worker-dependent minutes, and the Gloo
# context-init rendezvous only waits 30 s — the faster worker would
# time out waiting for the slower one.
from jax.experimental import multihost_utils
print("STAGE init-done", flush=True)
multihost_utils.sync_global_devices("gloo-warmup")
print("STAGE warmup-done", flush=True)

import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.getcwd())  # tests/ (subprocess cwd)
from camera_calibration_tpu.ba import lm_pcg
from camera_calibration_tpu.ba.dataset import ObservationTable
from camera_calibration_tpu.ba.state import BAState
from camera_calibration_tpu.models import central_generic as cg

# Load the EXACT problem the parent built (problem construction involves
# iterative model fitting whose floating-point result is not guaranteed
# bit-identical across processes with different device/thread configs —
# the test compares costs at 1e-9, so all participants must share one
# problem instance).
z = np.load(sys.argv[3])
state0 = BAState(
    rig_q_global=jnp.asarray(z["rig_q"]), rig_t_global=jnp.asarray(z["rig_t"]),
    cam_q_rig=jnp.asarray(z["cam_q"]), cam_t_rig=jnp.asarray(z["cam_t"]),
    points=jnp.asarray(z["points"]),
    intrinsics=(cg.CentralGenericModel(
        grid=jnp.asarray(z["grid"]),
        width=int(z["meta"][0]), height=int(z["meta"][1]),
        calibration_min_x=int(z["meta"][2]), calibration_min_y=int(z["meta"][3]),
        calibration_max_x=int(z["meta"][4]), calibration_max_y=int(z["meta"][5]),
    ),),
)
data = (ObservationTable(
    imageset=jnp.asarray(z["t_imageset"]), camera=jnp.asarray(z["t_camera"]),
    point=jnp.asarray(z["t_point"]), pixel=jnp.asarray(z["t_pixel"]),
    valid=jnp.asarray(z["t_valid"]),
),)

# this host's local slice: contiguous half of each table
local = []
for seg in data:
    n = seg.imageset.shape[0]
    half = n // 2
    sl = slice(proc_id * half, (proc_id + 1) * half)
    local.append(ObservationTable(
        imageset=seg.imageset[sl], camera=seg.camera[sl],
        point=seg.point[sl], pixel=seg.pixel[sl], valid=seg.valid[sl],
    ))

mesh = dist.global_mesh()
data_sh = dist.shard_observations_multihost(tuple(local), mesh)
state_sh = dist.replicate_multihost(state0, mesh)
warm_sh = tuple(s.pixel for s in data_sh)
lam_sh = dist.replicate_multihost(jnp.asarray(-1.0, jnp.float64), mesh)

options = lm_pcg.BAOptions(max_pcg_iterations=25)
step = lm_pcg.make_lm_step(options)
# AOT-compile, then rendezvous at the coordination-service barrier (NOT
# a device collective: Gloo ops only wait ~30 s) before executing: the
# LM-step compile takes minutes with worker-dependent skew on a shared
# box, and the worker that finishes first would otherwise time out in
# the execution collectives / shutdown barrier waiting for the other.
print("STAGE problem-built", flush=True)
compiled = step.lower(state_sh, warm_sh, lam_sh, data_sh).compile()
print("STAGE compiled", flush=True)
from jax._src import distributed as _dj
_dj.global_state.client.wait_at_barrier("lm_compiled", timeout_in_ms=900_000)
print("STAGE barrier-done", flush=True)
out = compiled(state_sh, warm_sh, lam_sh, data_sh)
cost = float(out[4])
new_cost = float(out[5])
print("RESULT " + json.dumps({"pid": proc_id, "cost": cost,
                              "new_cost": new_cost}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_cpu_mesh(tmp_path):
    import jax
    import jax.numpy as jnp

    import ba_harness
    from camera_calibration_tpu.ba import lm_pcg
    from camera_calibration_tpu.ba.dataset import pad_table, split_by_camera
    from camera_calibration_tpu.parallel import sharding

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    # Build ONE problem instance here and ship it to the workers: problem
    # construction runs an iterative fit whose result is not bit-stable
    # across process configurations, and the assertions below compare
    # costs at 1e-9.
    state_gt, obs, segments = ba_harness.make_problem(
        seed=0, n_points=40, n_poses=8
    )
    state0 = ba_harness.perturb_state(state_gt, seed=1)
    data = tuple(pad_table(s, 8) for s in split_by_camera(obs, segments))
    m = state0.intrinsics[0]
    problem = tmp_path / "problem.npz"
    np.savez(
        problem,
        rig_q=np.asarray(state0.rig_q_global),
        rig_t=np.asarray(state0.rig_t_global),
        cam_q=np.asarray(state0.cam_q_rig),
        cam_t=np.asarray(state0.cam_t_rig),
        points=np.asarray(state0.points),
        grid=np.asarray(m.grid),
        meta=np.asarray([m.width, m.height, m.calibration_min_x,
                         m.calibration_min_y, m.calibration_max_x,
                         m.calibration_max_y], np.int64),
        t_imageset=np.asarray(data[0].imageset),
        t_camera=np.asarray(data[0].camera),
        t_point=np.asarray(data[0].point),
        t_pixel=np.asarray(data[0].pixel),
        t_valid=np.asarray(data[0].valid),
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # no shared persistent compilation cache across the distributed
    # workers: a cache hit in one worker and a feature-mismatch reload
    # in the other skews their arrival at the first collective past the
    # 30 s Gloo rendezvous timeout
    env["CCTPU_JAX_CACHE"] = "0"
    # the workers import the package regardless of the pytest cwd
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, str(problem)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    if any(p.returncode != 0 for p in procs):
        for i, (p, out) in enumerate(zip(procs, outs)):
            print(f"===== worker {i} rc={p.returncode} =====")
            print(out[-3000:])
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs[0][-2000:]
    # both processes compute the same replicated result
    assert results[0]["cost"] == results[1]["cost"]
    assert results[0]["new_cost"] == results[1]["new_cost"]

    # and it matches the single-process 8-device reference (same problem
    # instance the workers loaded)
    mesh = sharding.make_mesh(jax.devices()[:8])
    data_sh = sharding.shard_observations(data, mesh)
    state_sh = sharding.replicate(state0, mesh)
    warm_sh = tuple(s.pixel for s in data_sh)
    lam_sh = sharding.replicate(jnp.asarray(-1.0, jnp.float64), mesh)
    step = lm_pcg.make_lm_step(lm_pcg.BAOptions(max_pcg_iterations=25))
    out = step(state_sh, warm_sh, lam_sh, data_sh)
    cost_ref = float(out[4])
    assert abs(results[0]["cost"] - cost_ref) < 1e-9 * max(1.0, abs(cost_ref))
