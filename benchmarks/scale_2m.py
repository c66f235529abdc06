"""2M-observation single-chip BA scale demonstration.

1024 poses x 2048 points, 16x16 CentralGeneric grid, dense grid layout.
Pixels synthesized by host-side pinhole projection (the grid is an exact
pinhole fit, so residuals are spline-interp-sized) plus 0.3 px noise and
a perturbed initial state, so LM does real work.
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
import camera_calibration_tpu  # noqa
from camera_calibration_tpu import config as _cctpu_config

_cctpu_config.configure_compilation_cache(entry_point=True)
from camera_calibration_tpu.ba.dataset import ObservationTable
from camera_calibration_tpu.ba.state import BAState
from camera_calibration_tpu.ba import lm_pcg
from camera_calibration_tpu.models import central_generic as cg
from camera_calibration_tpu.ops import se3

w, h, gres = 640, 480, 16
n_poses, n_points = 1024, 2048
dtype = jnp.float32
rng = np.random.default_rng(0)

fx = fy = 0.85 * w
yy, xx = np.meshgrid(np.arange(gres), np.arange(gres), indexing="ij")
px = (xx - 1.0) / (gres - 3.0) * w
py = (yy - 1.0) / (gres - 3.0) * h
dirs = np.stack([(px - w / 2) / fx, (py - h / 2) / fy, np.ones_like(px, float)], -1)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
model = cg.CentralGenericModel(
    grid=jnp.asarray(dirs, dtype), width=w, height=h,
    calibration_min_x=0, calibration_min_y=0,
    calibration_max_x=w - 1, calibration_max_y=h - 1,
)

pts = np.stack([rng.uniform(-0.7, 0.7, n_points),
                rng.uniform(-0.5, 0.5, n_points),
                rng.uniform(-0.02, 0.02, n_points)], -1)
rot = rng.normal(0, 0.06, (n_poses, 3))
rig_q = np.stack([np.asarray(se3.quat_exp(jnp.asarray(r))) for r in rot])
rig_t = np.stack([[rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25),
                   rng.uniform(1.6, 2.4)] for _ in range(n_poses)])

# host pinhole projection for all (pose, point) pairs
def qmat(q):
    return np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
R = np.stack([qmat(q) for q in rig_q])  # (M,3,3)
xc = np.einsum("mij,pj->mpi", R, pts) + rig_t[:, None, :]  # (M,P,3)
u = xc[..., 0] / xc[..., 2] * fx + w / 2
v = xc[..., 1] / xc[..., 2] * fy + h / 2
valid = (xc[..., 2] > 0.1) & (u > 1) & (u < w - 1) & (v > 1) & (v < h - 1)
u = u + rng.normal(0, 0.3, u.shape)
v = v + rng.normal(0, 0.3, v.shape)
pix = np.stack([u, v], -1).reshape(-1, 2)
pix = np.where(valid.reshape(-1, 1), pix, 0.0)

mp = n_poses * n_points
seg = ObservationTable(
    imageset=jnp.asarray(np.repeat(np.arange(n_poses, dtype=np.int32), n_points)),
    camera=jnp.zeros(mp, jnp.int32),
    point=jnp.asarray(np.tile(np.arange(n_points, dtype=np.int32), n_poses)),
    pixel=jnp.asarray(pix, dtype),
    valid=jnp.asarray(valid.reshape(-1)),
    grid_shape=(n_poses, n_points),
)
data = (seg,)
n_valid = int(valid.sum())
print(f"rows {mp} valid {n_valid}", flush=True)

state = BAState(
    rig_q_global=jnp.asarray(rig_q, dtype),
    rig_t_global=jnp.asarray(rig_t + rng.normal(0, 0.002, rig_t.shape), dtype),
    cam_q_rig=jnp.asarray([[1.0, 0, 0, 0]], dtype),
    cam_t_rig=jnp.zeros((1, 3), dtype),
    points=jnp.asarray(pts + rng.normal(0, 0.002, pts.shape), dtype),
    intrinsics=(model,),
)

n_scan = 3
options = lm_pcg.BAOptions(max_pcg_iterations=20, proj_iterations=8,
                           lm_steps_per_call=n_scan)
step = lm_pcg.make_lm_scan(options, n_scan)
warm = tuple(s.pixel for s in data)
lam = jnp.asarray(-1.0, dtype)
t0 = time.perf_counter()
out = step(state, warm, lam, data)
jax.block_until_ready(out)
print(f"compile+first call {time.perf_counter()-t0:.1f}s", flush=True)
s, wm, lm_, outs = out
print("costs", np.asarray(outs[1]), "->", np.asarray(outs[2]),
      "accept", np.asarray(outs[0]), flush=True)
t0 = time.perf_counter()
s, wm, lm_, outs = step(s, wm, lm_, data)
float(s.points.sum())
dt = time.perf_counter() - t0
print(f"steady: {n_scan} LM steps in {dt:.2f}s -> {n_scan/dt:.3f} LM iter/s "
      f"({n_valid} valid obs)", flush=True)
print("costs", np.asarray(outs[1]), "->", np.asarray(outs[2]),
      "accept", np.asarray(outs[0]), flush=True)
