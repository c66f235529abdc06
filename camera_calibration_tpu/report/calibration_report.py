"""Calibration report: metrics text file + visualization PNGs per camera.

Capability parity with the reference's calibration report (reference:
applications/camera_calibration/src/camera_calibration/
calibration_report.cc:83-1165; semantics documented Readme.md:521-582):

per camera, writes
- ``report_cameraX_info.txt`` — resolution, FoV, imageset counts,
  reprojection error count/median/average/maximum, and the
  ``median_kl_divergence`` bias score (calibration_report.cc:671-710);
- ``report_cameraX_errors_histogram.png`` — 2D histogram of reprojection
  error vectors;
- ``report_cameraX_error_magnitudes.png`` — per-cell mean error magnitude
  over the image;
- ``report_cameraX_error_directions.png`` — per-cell mean error direction
  (hue) — the role of the reference's Voronoi direction visualization;
- ``report_cameraX_observation_directions.png`` — visualization of the
  calibrated observation directions.

Visualization backend: matplotlib (Agg).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from camera_calibration_tpu.ba.state import transform_to_camera
from camera_calibration_tpu.models import protocol


def _error_data(state, data, camera_index):
    seg = data[camera_index]
    x_cam, _ = transform_to_camera(
        state, seg.imageset, seg.camera, state.points[seg.point]
    )
    px, _, pvalid = protocol.project_points(
        state.intrinsics[camera_index], x_cam, init_xy=seg.pixel,
        max_iterations=30,
    )
    valid = np.asarray(pvalid & seg.valid)
    err = np.asarray(px - seg.pixel)[valid]
    pix = np.asarray(seg.pixel)[valid]
    ims = np.asarray(seg.imageset)[valid]
    return err, pix, ims


def _kl_bias_score(err, pix, image_size, cell_px=50, n_bins=8):
    """Median KL divergence of per-cell error-direction histograms vs
    uniform — the reference's biasedness score
    (calibration_report.cc:671-710 semantics)."""
    w, h = image_size
    angles = np.arctan2(err[:, 1], err[:, 0])
    bins = ((angles + np.pi) / (2 * np.pi) * n_bins).astype(int) % n_bins
    cx = np.clip((pix[:, 0] / cell_px).astype(int), 0, max(0, w // cell_px))
    cy = np.clip((pix[:, 1] / cell_px).astype(int), 0, max(0, h // cell_px))
    cells = cy * (w // cell_px + 1) + cx
    kls = []
    for c in np.unique(cells):
        m = cells == c
        if m.sum() < 2 * n_bins:
            continue
        p = np.bincount(bins[m], minlength=n_bins).astype(float)
        p /= p.sum()
        q = 1.0 / n_bins
        nz = p > 0
        kls.append(float(np.sum(p[nz] * np.log(p[nz] / q))))
    return float(np.median(kls)) if kls else 0.0


def create_calibration_report(
    base_path,
    state,
    data,
    *,
    num_total_imagesets=None,
    histogram_half_extent_px=0.2,
    max_error_px=1.0,
):
    """Write report files for every camera. Returns per-camera metrics."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(base_path, exist_ok=True)
    all_metrics = []
    for ci in range(len(state.intrinsics)):
        model = state.intrinsics[ci]
        w, h = model.width, model.height
        err, pix, ims = _error_data(state, data, ci)
        mags = np.linalg.norm(err, axis=-1)
        n_localized = len(np.unique(ims))
        metrics = {
            "resolution": f"{w} x {h}",
            "num_localized_imagesets": int(n_localized),
            "num_total_imagesets": int(num_total_imagesets or n_localized),
            "reprojection_error_count": int(mags.size),
            "reprojection_error_median": float(np.median(mags)) if mags.size else float("nan"),
            "reprojection_error_average": float(np.mean(mags)) if mags.size else float("nan"),
            "reprojection_error_maximum": float(np.max(mags)) if mags.size else float("nan"),
            "median_kl_divergence": _kl_bias_score(err, pix, (w, h)),
        }
        prefix = os.path.join(base_path, f"report_camera{ci}")

        with open(prefix + "_info.txt", "w") as f:
            f.write(f"resolution : {metrics['resolution']}\n\n")
            f.write(
                f"num_localized_imagesets : {metrics['num_localized_imagesets']}\n"
            )
            f.write(f"num_total_imagesets : {metrics['num_total_imagesets']}\n\n")
            f.write(
                f"reprojection_error_count : {metrics['reprojection_error_count']}\n"
            )
            f.write(
                "reprojection_error_median : %.14g\n"
                % metrics["reprojection_error_median"]
            )
            f.write(
                "reprojection_error_average : %.14g\n"
                % metrics["reprojection_error_average"]
            )
            f.write(
                "reprojection_error_maximum : %.14g\n"
                % metrics["reprojection_error_maximum"]
            )
            f.write(
                "median_kl_divergence : %.14g\n\n"
                % metrics["median_kl_divergence"]
            )
            f.write(
                "reprojection_error_histogram_visualization_half_extent_in_pixels : %g\n"
                % histogram_half_extent_px
            )
            f.write(
                "maximum_error_visualization_maximum_error_in_pixels : %g\n"
                % max_error_px
            )

        if mags.size:
            # error histogram
            fig, ax = plt.subplots(figsize=(4, 4), dpi=100)
            e = histogram_half_extent_px
            ax.hist2d(
                err[:, 0], err[:, 1], bins=64, range=[[-e, e], [-e, e]],
                cmap="viridis",
            )
            ax.set_xlabel("error x [px]")
            ax.set_ylabel("error y [px]")
            fig.tight_layout()
            fig.savefig(prefix + "_errors_histogram.png")
            plt.close(fig)

            # per-cell magnitudes and directions
            cell = max(8, min(w, h) // 40)
            gw_, gh_ = w // cell + 1, h // cell + 1
            mag_img = np.zeros((gh_, gw_))
            cnt_img = np.zeros((gh_, gw_))
            angc = np.zeros((gh_, gw_), complex)
            cx = np.clip((pix[:, 0] / cell).astype(int), 0, gw_ - 1)
            cy = np.clip((pix[:, 1] / cell).astype(int), 0, gh_ - 1)
            np.add.at(mag_img, (cy, cx), mags)
            np.add.at(cnt_img, (cy, cx), 1)
            np.add.at(angc, (cy, cx), err[:, 0] + 1j * err[:, 1])
            with np.errstate(invalid="ignore"):
                mean_mag = np.where(cnt_img > 0, mag_img / np.maximum(cnt_img, 1), np.nan)
            fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
            im = ax.imshow(mean_mag, cmap="inferno", vmin=0, vmax=max_error_px)
            fig.colorbar(im, ax=ax, label="mean |error| [px]")
            fig.tight_layout()
            fig.savefig(prefix + "_error_magnitudes.png")
            plt.close(fig)

            hue = (np.angle(angc) + np.pi) / (2 * np.pi)
            sat = np.where(cnt_img > 0, 1.0, 0.0)
            val = np.where(cnt_img > 0, 1.0, 0.2)
            import matplotlib.colors as mcolors

            rgb = mcolors.hsv_to_rgb(np.stack([hue, sat, val], -1))
            fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
            ax.imshow(rgb)
            ax.set_title("mean error direction (hue)")
            fig.tight_layout()
            fig.savefig(prefix + "_error_directions.png")
            plt.close(fig)

        # observation directions visualization
        ys = np.linspace(1, h - 2, 120)
        xs = np.linspace(1, w - 2, 160)
        gx, gy = np.meshgrid(xs, ys)
        px_grid = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))
        dirs, dvalid = protocol.unproject(model, px_grid)
        dirs = np.asarray(dirs).reshape(len(ys), len(xs), 3)
        dvalid = np.asarray(dvalid).reshape(len(ys), len(xs))
        rgb = 0.5 * (dirs + 1.0)
        rgb[~dvalid] = 0.0
        fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
        ax.imshow(np.clip(rgb, 0, 1))
        ax.set_title("observation directions (xyz -> rgb)")
        fig.tight_layout()
        fig.savefig(prefix + "_observation_directions.png")
        plt.close(fig)

        all_metrics.append(metrics)
    return all_metrics
