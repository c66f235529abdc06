"""Per-stage calibration visualization: the CalibrationWindow analog.

The reference's live GUI exposes a per-stage update API that the pipeline
calls as it progresses (reference: applications/camera_calibration/src/
camera_calibration/ui/calibration_window.h:54-64 —
UpdateFeatureDetection / UpdateInitialization / UpdateObservationDirections /
UpdateErrorHistogram / UpdateReprojectionErrors / UpdateErrorDirections /
UpdateRemovedOutliers — consumed from Calibrate() after each BA iteration,
calibration.cc:256-290).  This headless equivalent writes the same
visualizations as PNG files into a live directory that an operator can
watch (feh/browser auto-refresh), updated in place per stage/iteration.

Every hook is cheap-by-default: iteration-dense stages (reprojection
errors) re-render at most every ``min_update_seconds``.
"""

from __future__ import annotations

import os
import time

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


class CalibrationVisualizer:
    """Writes per-stage PNGs into ``directory`` as calibration progresses."""

    def __init__(self, directory, min_update_seconds: float = 1.0):
        self.directory = directory
        self.min_update_seconds = min_update_seconds
        self._last = {}
        os.makedirs(directory, exist_ok=True)

    def _throttle(self, key) -> bool:
        now = time.monotonic()
        if now - self._last.get(key, -1e9) < self.min_update_seconds:
            return True
        self._last[key] = now
        return False

    def _path(self, name):
        return os.path.join(self.directory, name + ".png")

    # -- stage hooks (reference: calibration_window.h:54-64) ---------------

    def update_feature_detection(self, camera_index, image, features):
        """Detection overlay for one camera image
        (reference: UpdateFeatureDetection)."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
        ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=1)
        if features:
            xy = np.array([f.xy for f in features])
            ax.plot(xy[:, 0] - 0.5, xy[:, 1] - 0.5, "+", color="lime", ms=5)
        ax.set_title(f"camera {camera_index}: {len(features)} features")
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(self._path(f"feature_detection_camera{camera_index}"))
        plt.close(fig)

    def update_initialization(self, camera_index, dense_directions, valid):
        """Dense-init direction image (reference: UpdateInitialization) —
        directions mapped to RGB as 0.5·(d+1)."""
        plt = _plt()
        d = np.asarray(dense_directions)
        rgb = np.where(np.asarray(valid)[..., None], 0.5 * (d + 1.0), 0.0)
        fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
        ax.imshow(np.clip(rgb, 0, 1))
        ax.set_title(f"camera {camera_index}: dense initialization")
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(self._path(f"initialization_camera{camera_index}"))
        plt.close(fig)

    def update_observation_directions(self, camera_index, model):
        """Calibrated observation directions of the current model
        (reference: UpdateObservationDirections)."""
        from camera_calibration_tpu.models import protocol

        plt = _plt()
        w, h = model.width, model.height
        xs = np.linspace(0.5, w - 0.5, min(w, 160))
        ys = np.linspace(0.5, h - 0.5, min(h, 120))
        xx, yy = np.meshgrid(xs, ys)
        px = np.stack([xx, yy], -1).reshape(-1, 2)
        dirs, valid = protocol.unproject(model, px)
        d = np.asarray(dirs).reshape(len(ys), len(xs), 3)
        v = np.asarray(valid).reshape(len(ys), len(xs))
        rgb = np.where(v[..., None], 0.5 * (d + 1.0), 0.0)
        fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
        ax.imshow(np.clip(rgb, 0, 1))
        ax.set_title(f"camera {camera_index}: observation directions")
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(self._path(f"observation_directions_camera{camera_index}"))
        plt.close(fig)

    def _error_data(self, state, data):
        from camera_calibration_tpu.calibrate import (
            observation_reprojection_errors,
        )

        errs = observation_reprojection_errors(state, data)
        out = []
        for seg, e in zip(data, errs):
            e_np = np.asarray(e)
            finite = np.isfinite(e_np)
            out.append((np.asarray(seg.pixel)[finite], e_np[finite]))
        return out

    def update_reprojection_errors(self, state, data, iteration=None):
        """Per-camera spatial error map, refreshed as BA iterates
        (reference: UpdateReprojectionErrors after every iteration)."""
        if self._throttle("reproj"):
            return
        plt = _plt()
        for ci, (pix, mags) in enumerate(self._error_data(state, data)):
            model = state.intrinsics[ci]
            fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
            if mags.size:
                sc = ax.scatter(pix[:, 0], pix[:, 1], c=np.minimum(mags, 1.0),
                                s=3, cmap="inferno", vmin=0, vmax=1)
                fig.colorbar(sc, ax=ax, label="|error| [px]")
            ax.set_xlim(0, model.width)
            ax.set_ylim(model.height, 0)
            med = float(np.median(mags)) if mags.size else float("nan")
            t = f"camera {ci}: median {med:.4f} px"
            if iteration is not None:
                t += f" (iteration {iteration})"
            ax.set_title(t)
            fig.tight_layout()
            fig.savefig(self._path(f"reprojection_errors_camera{ci}"))
            plt.close(fig)

    def update_error_histogram(self, state, data, half_extent_px=0.2):
        """2-D error histogram (reference: UpdateErrorHistogram)."""
        plt = _plt()
        from camera_calibration_tpu.ba.state import transform_to_camera
        from camera_calibration_tpu.models import protocol

        for ci, seg in enumerate(data):
            x_cam, _ = transform_to_camera(
                state, seg.imageset, seg.camera, state.points[seg.point]
            )
            px, _, pvalid = protocol.project_points(
                state.intrinsics[ci], x_cam, init_xy=seg.pixel,
                max_iterations=30,
            )
            e = np.asarray(px - seg.pixel)
            keep = np.asarray(pvalid) & np.asarray(seg.valid)
            e = e[keep & np.all(np.isfinite(e), -1)]
            fig, ax = plt.subplots(figsize=(5, 5), dpi=90)
            if e.size:
                he = half_extent_px
                ax.hist2d(e[:, 0], e[:, 1], bins=64,
                          range=[[-he, he], [-he, he]], cmap="viridis")
            ax.set_title(f"camera {ci}: error histogram")
            fig.tight_layout()
            fig.savefig(self._path(f"error_histogram_camera{ci}"))
            plt.close(fig)

    def update_error_directions(self, state, data):
        """Error direction as hue at each observation
        (reference: UpdateErrorDirections)."""
        plt = _plt()
        import matplotlib.colors as mcolors

        from camera_calibration_tpu.ba.state import transform_to_camera
        from camera_calibration_tpu.models import protocol

        for ci, seg in enumerate(data):
            x_cam, _ = transform_to_camera(
                state, seg.imageset, seg.camera, state.points[seg.point]
            )
            px, _, pvalid = protocol.project_points(
                state.intrinsics[ci], x_cam, init_xy=seg.pixel,
                max_iterations=30,
            )
            e = np.asarray(px - seg.pixel)
            keep = np.asarray(pvalid) & np.asarray(seg.valid)
            keep &= np.all(np.isfinite(e), -1)
            pix = np.asarray(seg.pixel)[keep]
            e = e[keep]
            fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
            if e.size:
                hue = (np.arctan2(e[:, 1], e[:, 0]) + np.pi) / (2 * np.pi)
                rgb = mcolors.hsv_to_rgb(
                    np.stack([hue, np.ones_like(hue), np.ones_like(hue)], -1)
                )
                ax.scatter(pix[:, 0], pix[:, 1], c=rgb, s=3)
            model = state.intrinsics[ci]
            ax.set_xlim(0, model.width)
            ax.set_ylim(model.height, 0)
            ax.set_title(f"camera {ci}: error directions (hue)")
            fig.tight_layout()
            fig.savefig(self._path(f"error_directions_camera{ci}"))
            plt.close(fig)

    def update_removed_outliers(self, state, data, removed_count):
        """Remaining-observation map after outlier deletion
        (reference: UpdateRemovedOutliers)."""
        plt = _plt()
        for ci, seg in enumerate(data):
            pix = np.asarray(seg.pixel)
            valid = np.asarray(seg.valid)
            model = state.intrinsics[ci]
            fig, ax = plt.subplots(figsize=(6, 5), dpi=90)
            ax.plot(pix[valid, 0], pix[valid, 1], ".", ms=2, color="tab:blue",
                    label="kept")
            ax.plot(pix[~valid, 0], pix[~valid, 1], "x", ms=4, color="red",
                    label="removed")
            ax.set_xlim(0, model.width)
            ax.set_ylim(model.height, 0)
            ax.legend(loc="upper right")
            ax.set_title(
                f"camera {ci}: outliers ({removed_count} removed total)"
            )
            fig.tight_layout()
            fig.savefig(self._path(f"removed_outliers_camera{ci}"))
            plt.close(fig)
