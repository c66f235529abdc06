"""Fitting report: fit parametric models to a generic calibration.

Capability parity with the reference's fitting report (reference:
applications/camera_calibration/src/camera_calibration/
fitting_report.h:56,206): fit each requested parametric model to a
generic model's dense unprojection field and report + visualize the
residual reprojection field (where does a 12-parameter model deviate from
the 10k-parameter calibration, and by how much).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from camera_calibration_tpu.models import parametric as pm
from camera_calibration_tpu.models import protocol


def fit_and_report(
    generic_model,
    base_path,
    model_names=("central_thin_prism_fisheye", "central_opencv", "central_radial"),
    subsample: int = 4,
    log=print,
    co_estimate_rotation: bool = False,
):
    """Fit parametric models to `generic_model`; write report files.

    With ``co_estimate_rotation`` each fit additionally estimates a global
    rotation of the calibration (reference parametric_r_dense,
    parametric.cc:427-462); it is reported as ``rotation_quaternion`` and
    should be folded into camera_tr_rig by the caller
    (calibration.cc:491-499).

    Returns {name: metrics dict}.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(base_path, exist_ok=True)
    w, h = generic_model.width, generic_model.height
    xs = np.arange(0, w, subsample) + 0.5
    ys = np.arange(0, h, subsample) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))
    dirs, valid = protocol.unproject(generic_model, px)
    dense = np.asarray(dirs).reshape(len(ys), len(xs), 3)
    vmask = np.asarray(valid).reshape(len(ys), len(xs))

    templates = {
        "central_thin_prism_fisheye": pm.CentralThinPrismFisheyeModel(
            params=jnp.zeros(12), width=w, height=h,
            use_equidistant_projection=True,
        ),
        "central_opencv": pm.CentralOpenCVModel(
            params=jnp.zeros(12), width=w, height=h
        ),
        "central_radial": pm.CentralRadialModel(
            params=jnp.zeros(8 + 50), width=w, height=h
        ),
    }

    pixel_coords = np.stack([gx, gy], -1)
    out = {}
    for name in model_names:
        res = pm.fit_parametric_to_dense(
            templates[name], dense, vmask, max_iterations=60,
            pixel_coords=pixel_coords,
            co_estimate_rotation=co_estimate_rotation,
        )
        if co_estimate_rotation:
            fitted, q_rot = res
        else:
            fitted, q_rot = res, None
        # residual field: project the generic directions with the fitted
        # model, compare against the source pixels
        from camera_calibration_tpu.ops import se3 as se3_ops

        dirs_flat = jnp.asarray(dense.reshape(-1, 3))
        if q_rot is not None:
            dirs_flat = se3_ops.quat_rotate(jnp.asarray(q_rot), dirs_flat)
        pred, _, pvalid = pm.project_points(fitted, dirs_flat)
        m = np.asarray(pvalid) & vmask.reshape(-1)
        err_vec = np.asarray(pred) - np.asarray(px)
        err = np.linalg.norm(err_vec, axis=-1)
        err_field = np.full(vmask.shape, np.nan)
        err_field.reshape(-1)[m] = err[m]
        metrics = {
            "fitting_error_median_px": float(np.median(err[m])),
            "fitting_error_average_px": float(np.mean(err[m])),
            "fitting_error_maximum_px": float(np.max(err[m])),
        }
        if q_rot is not None:
            metrics["rotation_quaternion"] = [float(v) for v in np.asarray(q_rot)]
        out[name] = metrics
        log(f"[fitting] {name}: {metrics}")

        prefix = os.path.join(base_path, f"fitting_{name}")
        with open(prefix + "_info.txt", "w") as f:
            for k, v in metrics.items():
                if isinstance(v, list):
                    f.write(f"{k} : " + " ".join(f"{x:.14g}" for x in v) + "\n")
                else:
                    f.write(f"{k} : {v:.14g}\n")
        fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
        im = ax.imshow(err_field, cmap="inferno")
        fig.colorbar(im, ax=ax, label="|reprojection residual| [px]")
        ax.set_title(f"{name} fit residual")
        fig.tight_layout()
        fig.savefig(prefix + "_residual_field.png")
        plt.close(fig)
    return out
