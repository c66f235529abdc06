"""Benchmark: full bundle-adjustment LM iterations per second on one chip.

Measures the end-to-end hot path of the framework — one complete LM step
(batched generic-model projection with warm starts, closed-form Jacobian
blocks, Jacobi-PCG normal-equation solve, accept test) on a synthetic
CentralGeneric mono problem sized like a real calibration run
(~150k observations, 256 poses, 1k points, 16x16 grid ≈ 768 intrinsics
 parameters + 2.6k pose/point parameters).

The reference publishes no throughput numbers (BASELINE.md); its CPU BA
on problems of this size runs on the order of ~1 LM iteration/s (f64,
numeric 32-knot-perturbation intrinsics Jacobians per observation —
reference: central_grid.h:188-245), which we use as the baseline anchor
for vs_baseline.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

BASELINE_LM_ITERS_PER_S = 1.0


def make_bench_problem(w=640, h=480, gres=16, n_points=1024, n_poses=256,
                       seed=0):
    """Synthetic CentralGeneric mono problem (state, data tuple, meta)."""
    import jax
    import jax.numpy as jnp

    import camera_calibration_tpu  # noqa: F401
    from camera_calibration_tpu.ba.dataset import ObservationTable
    from camera_calibration_tpu.ba.state import BAState
    from camera_calibration_tpu.models import central_generic as cg
    from camera_calibration_tpu.ops import se3

    dtype = jnp.float32
    rng = np.random.default_rng(seed)

    fx = fy = 0.85 * w
    yy, xx = np.meshgrid(np.arange(gres), np.arange(gres), indexing="ij")
    px = (xx - 1.0) / (gres - 3.0) * w
    py = (yy - 1.0) / (gres - 3.0) * h
    dirs = np.stack([(px - w / 2) / fx, (py - h / 2) / fy, np.ones_like(px, float)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    model = cg.CentralGenericModel(
        grid=jnp.asarray(dirs, dtype),
        width=w, height=h,
        calibration_min_x=0, calibration_min_y=0,
        calibration_max_x=w - 1, calibration_max_y=h - 1,
    )

    pts = np.stack(
        [rng.uniform(-0.7, 0.7, n_points), rng.uniform(-0.5, 0.5, n_points),
         rng.uniform(-0.02, 0.02, n_points)], -1)
    rig_q = np.stack([
        np.asarray(se3.quat_exp(jnp.asarray(rng.normal(0, 0.08, 3))))
        for _ in range(n_poses)
    ])
    rig_t = np.stack([
        [rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25), rng.uniform(1.6, 2.4)]
        for _ in range(n_poses)
    ])
    state = BAState(
        rig_q_global=jnp.asarray(rig_q, dtype),
        rig_t_global=jnp.asarray(rig_t, dtype),
        cam_q_rig=jnp.asarray([[1.0, 0, 0, 0]], dtype),
        cam_t_rig=jnp.zeros((1, 3), dtype),
        points=jnp.asarray(pts, dtype),
        intrinsics=(model,),
    )

    # Generate exact observations on-device, in pose batches.
    all_im, all_pt, all_px = [], [], []
    proj = jax.jit(lambda xc: cg.project_points(model, xc, max_iterations=40))
    for mi in range(n_poses):
        x_cam = np.asarray(se3.quat_rotate(jnp.asarray(rig_q[mi]), jnp.asarray(pts))) + rig_t[mi]
        pxs, _, valid = proj(jnp.asarray(x_cam, dtype))
        pxs, valid = np.asarray(pxs), np.asarray(valid)
        inside = valid & (pxs[:, 0] > 1) & (pxs[:, 0] < w - 1) & (pxs[:, 1] > 1) & (pxs[:, 1] < h - 1)
        idx = np.nonzero(inside)[0]
        all_im.append(np.full(idx.size, mi, np.int32))
        all_pt.append(idx.astype(np.int32))
        all_px.append(pxs[idx])
    im = np.concatenate(all_im)
    pt = np.concatenate(all_pt)
    pxo = np.concatenate(all_px)
    n = im.size
    cap = ((n + 8191) // 8192) * 8192
    seg = ObservationTable(
        imageset=jnp.asarray(np.pad(im, (0, cap - n))),
        camera=jnp.zeros(cap, jnp.int32),
        point=jnp.asarray(np.pad(pt, (0, cap - n))),
        pixel=jnp.asarray(np.pad(pxo, ((0, cap - n), (0, 0))), dtype),
        valid=jnp.asarray(np.arange(cap) < n),
    )
    from camera_calibration_tpu.ba.dataset import to_grid_layout

    data = (to_grid_layout(seg, n_poses, n_points),)

    # Perturb so the solver does real work.
    state = perturb_bench_state(state, seed=seed + 1)
    return state, data, {"n_obs": n, "gres": gres}


def perturb_bench_state(state, seed):
    """Fresh noise on poses/points so each timed trial optimizes for real."""
    import jax.numpy as jnp

    from camera_calibration_tpu.ba.state import BAState

    dtype = state.points.dtype
    rng = np.random.default_rng(seed)
    return BAState(
        rig_q_global=state.rig_q_global,
        rig_t_global=state.rig_t_global
        + jnp.asarray(rng.normal(0, 0.003, state.rig_t_global.shape), dtype),
        cam_q_rig=state.cam_q_rig,
        cam_t_rig=state.cam_t_rig,
        points=state.points
        + jnp.asarray(rng.normal(0, 0.003, state.points.shape), dtype),
        intrinsics=state.intrinsics,
    )


def bench_corner_refinement():
    """Corner refinement throughput on the chip (features/s).

    2048 features × (64 matching + 512 symmetry) samples × 30 LM
    iterations each on a 1280×1024 image, through the SHIPPED detector
    device path: the fused two-stage call (patch extract → matching →
    re-extract → 8-DoF symmetry in ONE dispatch,
    features/patch_refinement.refine_two_stage_patches) — what the
    growth loop actually invokes per ring, so the headline matches the
    detector (matching uses 1/8 of the samples, reference
    feature_detector_tagged_pattern.cc:1483-1484)."""
    import time

    import jax
    import jax.numpy as jnp

    from camera_calibration_tpu.features import patch_refinement as pr
    from camera_calibration_tpu.features import refinement as ref

    rng = np.random.default_rng(0)
    h, w = 1024, 1280
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    n_f, n_s, whs = 2048, 512, 10
    n_match = n_s // 8
    positions = rng.uniform(60, [w - 60, h - 60], (n_f, 2))
    patch = pr.patch_size_for_window(whs)
    img_j = jax.device_put(jnp.asarray(img))
    float(img_j.sum())
    h0 = np.tile(np.eye(3, dtype=np.float32), (n_f, 1, 1))
    h0[:, 0, 0] += rng.uniform(-0.05, 0.05, n_f)
    h0[:, 1, 1] += rng.uniform(-0.05, 0.05, n_f)
    offs = ref.make_sample_offsets(rng, whs, n_s) * whs
    samples = np.tile(offs[None], (n_f, 1, 1)).astype(np.float32)
    rendered = rng.uniform(0, 1, (n_f, n_match)).astype(np.float32)
    hj = jnp.asarray(h0)
    sj = jnp.asarray(samples)
    smj = jnp.asarray(samples[:, :n_match])
    rj = jnp.asarray(rendered)
    svm = jnp.asarray(np.ones((n_f, n_match), bool))
    svj = jnp.asarray(np.ones((n_f, n_s), bool))
    posj = jnp.asarray(positions.astype(np.float32))

    def run():
        packed = pr.refine_two_stage_patches(
            img_j, posj, hj, smj, rj, svm, sj, svj, whs, patch
        )
        return float(packed.sum())

    run()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return n_f / min(ts)


def bench_scaling_subprocess():
    """GSPMD sharding-overhead measurement in a CPU subprocess."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable,
         __file__.replace("bench.py", "bench_scaling.py")],
        capture_output=True, text=True, timeout=900,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-500:] + out.stderr[-500:])


def main():
    import jax
    import jax.numpy as jnp

    from camera_calibration_tpu import config as _cctpu_config
    from camera_calibration_tpu.ba import lm_pcg

    _cctpu_config.configure_compilation_cache(entry_point=True)

    dtype = jnp.float32
    state, data, meta = make_bench_problem()
    n, gres = meta["n_obs"], meta["gres"]

    # Inexact-Newton cap: 20 CG iterations per LM step is where
    # time-to-convergence is best on this problem (the tail of a 50-iter
    # solve buys little extra LM progress).  20 LM steps are fused per
    # device call (lax.scan) to amortize the ~30 ms remote dispatch
    # latency.  Projections warm-start from the previous sweep, so 4
    # inner iterations match the converged trajectory of 10.
    n_scan = 20
    options = lm_pcg.BAOptions(max_pcg_iterations=20, proj_iterations=4,
                               lm_steps_per_call=n_scan)
    step = lm_pcg.make_lm_scan(options, n_scan)
    warm = tuple(s.pixel for s in data)
    lam0 = jnp.asarray(-1.0, dtype)

    # Warm-up/compile.
    out = step(state, warm, lam0, data)
    jax.block_until_ready(out)

    # Honest timing: every timed call starts from a FRESHLY perturbed
    # state (λ and projection warm starts reset), so the measured
    # iterations do real optimization work — heavy CG solves included —
    # rather than cheap post-convergence rejected steps.  An untimed
    # absorber call soaks up the remote runtime's first-dispatch spike
    # (~250 ms once per batch of calls); device syncs go through a
    # host-side reduction because block_until_ready under-measures on
    # this runtime.
    trials = []
    for trial in range(4):
        s_try = perturb_bench_state(state, seed=100 + trial)
        jax.block_until_ready(s_try)
        absorber = step(
            perturb_bench_state(state, seed=999), warm, lam0, data
        )
        float(absorber[0].points.sum())
        t0 = time.perf_counter()
        s2, _, _, _ = step(s_try, warm, lam0, data)
        float(s2.points.sum())
        trials.append(time.perf_counter() - t0)

    iters_per_s = n_scan / float(np.median(trials))

    extras = {}

    # --- roofline anchor: XLA's own cost analysis of the compiled step
    # gives bytes-accessed and FLOPs per 20-iteration scan call; divided
    # by measured wall time that anchors iter/s to the hardware ceilings
    # (TPU v5e: ~819 GB/s HBM, ~197 TFLOP/s bf16 / ~98 TFLOP/s f32).
    try:
        # step is the cached jax.jit function — re-lowering hits the
        # in-process executable cache, so this is cheap
        compiled = step.lower(state, warm, lam0, data).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        bytes_per_call = float(ca.get("bytes accessed", 0.0))
        flops_per_call = float(ca.get("flops", 0.0))
        med = float(np.median(trials))
        if bytes_per_call > 0:
            # static count: while-loop (CG) bodies are counted ONCE by
            # XLA (trip counts are dynamic), so this is a lower bound —
            # it matches the 134 MB-of-blocks-per-sweep figure.
            extras["hbm_static_gb_per_lm_iter"] = round(
                bytes_per_call / n_scan / 1e9, 4
            )
        if flops_per_call > 0:
            extras["static_tflop_per_lm_iter"] = round(
                flops_per_call / n_scan / 1e12, 5
            )
        # analytic traffic model: the CG matvec pair re-reads the block
        # cache twice per CG iteration (JᵀWJ needs the J pass then the
        # Jᵀ pass; the Schur elimination's data dependency forces the
        # two passes — RESULTS.md).  blocks bytes × 2 × measured CG
        # iterations dominates everything else at this scale.
        blocks0, _ = lm_pcg.compute_blocks(data, state, warm, options)
        b_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(blocks0)
            if hasattr(x, "size")
        )
        cg_iters = float(np.mean(np.asarray(out[3][3])))
        model_gb_per_iter = b_bytes * 2.0 * cg_iters / 1e9
        extras["cg_iters_per_lm_iter"] = round(cg_iters, 1)
        extras["hbm_model_gb_per_lm_iter"] = round(model_gb_per_iter, 3)
        extras["achieved_hbm_gb_per_s"] = round(
            model_gb_per_iter * iters_per_s, 1
        )
        extras["hbm_peak_fraction"] = round(
            model_gb_per_iter * iters_per_s / 819.0, 3
        )
    except Exception as e:
        extras["roofline_error"] = str(e)[:160]

    # --- time-to-convergence under the shipped solver="auto" default:
    # iter/s and wall-clock-to-target diverge (schur_direct's exact
    # Newton step is 10x slower per iteration yet wins time-to-converge
    # on small problems — RESULTS.md), so the driver tracks both.
    try:
        auto_opts = lm_pcg.BAOptions(
            max_lm_iterations=60, max_pcg_iterations=20,
            cost_reduction_threshold=1e-4, solver="auto",
            proj_iterations=4, lm_steps_per_call=5,
        )
        s_try = perturb_bench_state(state, seed=321)
        jax.block_until_ready(s_try)
        # one untimed run compiles the auto-solver path
        lm_pcg.optimize(s_try, None, None, auto_opts, data=data)
        s_try = perturb_bench_state(state, seed=322)
        jax.block_until_ready(s_try)
        t0 = time.perf_counter()
        _, info_auto = lm_pcg.optimize(
            s_try, None, None, auto_opts, data=data
        )
        extras["seconds_to_converge_auto"] = round(
            time.perf_counter() - t0, 3
        )
        extras["converged_cost_auto"] = float(info_auto["final_cost"])
    except Exception as e:
        extras["time_to_convergence_error"] = str(e)[:160]
    for attempt in range(3):  # retried: the remote runtime drops the
        try:                  # occasional compile RPC
            extras["corner_refinements_per_s"] = round(
                bench_corner_refinement()
            )
            extras.pop("corner_refinements_per_s_error", None)
            break
        except Exception as e:  # fail-soft: the headline metric prints
            extras["corner_refinements_per_s_error"] = str(e)[:200]
            time.sleep(2.0)
    try:
        sc = bench_scaling_subprocess()
        # Weak-scaling efficiency in CPU-seconds on the virtual 8-device
        # mesh: work-normalized so perfect partitioning = 1.0 (comparable
        # to the >=70% linear-scaling target); plus the static collective
        # traffic the partitioned step would put on ICI.
        extras["scaling_weak_efficiency_8dev"] = sc["scaling_weak_efficiency"]
        extras["collective_ops_per_step"] = sc.get("collective_ops_per_step")
        extras["collective_mb_per_step"] = sc.get("collective_mb_per_step")
    except Exception as e:
        extras["scaling_error"] = str(e)[:200]

    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_s",
                "value": round(iters_per_s, 3),
                "unit": f"LM iter/s ({n} obs, {gres}x{gres} grid, 1 chip)",
                "vs_baseline": round(iters_per_s / BASELINE_LM_ITERS_PER_S, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
