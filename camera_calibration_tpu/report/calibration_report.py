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

            # Voronoi error-direction diagram: every raster pixel takes
            # the error direction (hue) and magnitude (value) of its
            # NEAREST observation — the reference's CreateVoronoiDiagram
            # (calibration_report.cc:354).
            import matplotlib.colors as mcolors
            from scipy.spatial import cKDTree

            vw = min(w, 640)
            vh = max(1, int(round(vw * h / w)))
            gxv, gyv = np.meshgrid(
                (np.arange(vw) + 0.5) * w / vw,
                (np.arange(vh) + 0.5) * h / vh,
            )
            tree = cKDTree(pix)
            _, idx = tree.query(
                np.stack([gxv.ravel(), gyv.ravel()], -1), k=1
            )
            ang = np.arctan2(err[idx, 1], err[idx, 0]).reshape(vh, vw)
            mag_v = mags[idx].reshape(vh, vw)
            hue_v = (ang + np.pi) / (2 * np.pi)
            val_v = np.clip(mag_v / max(max_error_px, 1e-9), 0.15, 1.0)
            rgb = mcolors.hsv_to_rgb(
                np.stack([hue_v, np.ones_like(hue_v), val_v], -1)
            )
            fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
            ax.imshow(rgb)
            ax.set_title("error direction (hue) / magnitude (value), Voronoi")
            fig.tight_layout()
            fig.savefig(prefix + "_error_directions.png")
            plt.close(fig)

        # grid knot pixel locations (grid models only; reference
        # report_cameraX_grid_point_locations.png)
        if protocol.is_grid_model(model):
            from camera_calibration_tpu.models import central_generic as cg_m
            from camera_calibration_tpu.models import noncentral_generic as ncg_m

            if isinstance(model, ncg_m.NoncentralGenericModel):
                probe = cg_m.CentralGenericModel(
                    grid=model.direction_grid,
                    width=w, height=h,
                    calibration_min_x=model.calibration_min_x,
                    calibration_min_y=model.calibration_min_y,
                    calibration_max_x=model.calibration_max_x,
                    calibration_max_y=model.calibration_max_y,
                )
            else:
                probe = model
            knot_px = np.asarray(cg_m.grid_point_pixels(probe)).reshape(-1, 2)
            fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
            ax.scatter(knot_px[:, 0], knot_px[:, 1], s=6)
            ax.set_xlim(
                min(0, knot_px[:, 0].min()), max(w, knot_px[:, 0].max())
            )
            ax.set_ylim(
                max(h, knot_px[:, 1].max()), min(0, knot_px[:, 1].min())
            )
            ax.add_patch(plt.Rectangle((0, 0), w, h, fill=False,
                                       edgecolor="red"))
            ax.set_title("grid knot locations (image box in red)")
            fig.tight_layout()
            fig.savefig(prefix + "_grid_point_locations.png")
            plt.close(fig)

        # non-central extras: per-pixel line-offset magnitudes + a 3D .obj
        # line visualization (reference calibration_report.cc:934-936)
        from camera_calibration_tpu.models import noncentral_generic as ncg_m

        if isinstance(model, ncg_m.NoncentralGenericModel):
            ys_n = np.linspace(1, h - 2, 60)
            xs_n = np.linspace(1, w - 2, 80)
            gxn, gyn = np.meshgrid(xs_n, ys_n)
            pxn = jnp.asarray(np.stack([gxn, gyn], -1).reshape(-1, 2))
            d_n, o_n, v_n = ncg_m.unproject(model, pxn)
            d_n = np.asarray(d_n)
            o_n = np.asarray(o_n)
            # offsets relative to the best single center (least-squares
            # intersection point of all lines): how non-central is each px
            proj = np.eye(3)[None] - d_n[:, :, None] * d_n[:, None, :]
            a_sum = proj.sum(0)
            b_sum = np.einsum("nij,nj->i", proj, o_n)
            try:
                center = np.linalg.solve(a_sum, b_sum)
            except np.linalg.LinAlgError:
                center = o_n.mean(0)
            rel = o_n - center
            off = np.linalg.norm(
                rel - np.einsum("nj,nj->n", rel, d_n)[:, None] * d_n, axis=1
            ).reshape(len(ys_n), len(xs_n))
            fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
            im = ax.imshow(off * 1000.0, cmap="viridis")
            fig.colorbar(im, ax=ax, label="line offset from best center [mm]")
            ax.set_title("non-centrality (line offsets)")
            fig.tight_layout()
            fig.savefig(prefix + "_line_offsets.png")
            plt.close(fig)

            # .obj export: one segment per sampled pixel around the
            # closest approach to the best center
            with open(prefix + "_lines.obj", "w") as f:
                f.write("# noncentral camera line visualization\n")
                step = 7  # subsample for a readable mesh
                seg_half = 0.05
                count = 0
                for i in range(0, d_n.shape[0], step):
                    t0 = np.dot(center - o_n[i], d_n[i])
                    p_mid = o_n[i] + t0 * d_n[i]
                    a = p_mid - seg_half * d_n[i]
                    b = p_mid + seg_half * d_n[i]
                    f.write("v %.8g %.8g %.8g\n" % tuple(a))
                    f.write("v %.8g %.8g %.8g\n" % tuple(b))
                    count += 1
                for i in range(count):
                    f.write(f"l {2 * i + 1} {2 * i + 2}\n")

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
