"""Dense initialization integration test on a synthetic pinhole dataset.

(reference analog: the DenseInitialization path exercised by the
calibration E2E flow; dense_initialization.cc:1238-1449)
"""

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.ba.dataset import (
    Dataset,
    Imageset,
    KnownGeometry,
    PointFeature,
)
from camera_calibration_tpu.init.dense_init import DenseInitializer, DenseInitOptions
from camera_calibration_tpu.models import pinhole
from camera_calibration_tpu.ops import se3


def _make_synthetic_dataset(seed=0, n_imagesets=8, k=12, w=320, h=240,
                            cell=0.03):
    rng = np.random.default_rng(seed)
    cam = pinhole.make_pinhole(0.9 * w, 0.9 * w, 0.5 * w, 0.5 * h, w, h)

    geometry = KnownGeometry(
        cell_length_in_meters=cell,
        feature_id_to_position={
            r * k + c: (c, r) for r in range(k) for c in range(k)
        },
    )
    pattern_pts = np.array(
        [[c * cell, r * cell, 0.0] for r in range(k) for c in range(k)]
    )
    center_off = (k - 1) * cell / 2

    imagesets = []
    gt_poses = []
    for i in range(n_imagesets):
        # camera looks at the pattern from negative z
        q = se3.quat_exp(jnp.asarray(rng.normal(0, 0.12, 3)))
        r = np.asarray(se3.quat_to_matrix(q))
        # image_tr_global pose: x_cam = R x_g + t; put pattern in front (z>0)
        t = np.array([
            -center_off + rng.normal(0, 0.05),
            -center_off + rng.normal(0, 0.05),
            rng.uniform(0.45, 0.7),
        ])
        x_cam = pattern_pts @ r.T + t
        px, valid = pinhole.project(cam, jnp.asarray(x_cam))
        px, valid = np.asarray(px), np.asarray(valid)
        feats = [
            PointFeature(xy=px[j], feature_id=j)
            for j in range(k * k)
            if valid[j]
        ]
        imagesets.append(Imageset(features=[feats]))
        gt_poses.append((r, t))
    ds = Dataset(
        num_cameras=1,
        image_sizes=[(w, h)],
        imagesets=imagesets,
        known_geometries=[geometry],
    )
    return ds, cam, gt_poses


def test_dense_init_recovers_directions_and_poses():
    ds, cam, gt_poses = _make_synthetic_dataset()
    init = DenseInitializer(
        ds,
        0,
        DenseInitOptions(
            max_initialization_attempts=100, seed=1,
            min_matched_area_accept=0.15,
        ),
    )
    result = init.run()
    assert result is not None
    assert sum(result.image_used) >= 6, sum(result.image_used)

    dirs, valid = result.observation_directions()
    assert valid.mean() > 0.25, valid.mean()

    # Compare the recovered per-pixel directions with pinhole GT up to a
    # global rotation (gauge): estimate the aligning rotation with SVD.
    bw, bh = result.buffer_size
    w, h = result.image_size
    ys, xs = np.nonzero(valid)
    sel = np.arange(0, ys.size, max(1, ys.size // 3000))
    ys, xs = ys[sel], xs[sel]
    px_full = np.stack(
        [(xs + 0.5) * w / bw, (ys + 0.5) * h / bh], -1
    )
    gt_dirs = np.asarray(pinhole.unproject(cam, jnp.asarray(px_full)))
    est = dirs[ys, xs]
    m = est.T @ gt_dirs
    u, _, vt = np.linalg.svd(m)
    d = np.sign(np.linalg.det(u @ vt))
    r_align = u @ np.diag([1, 1, d]) @ vt
    aligned = est @ r_align
    ang = np.degrees(
        np.arccos(np.clip(np.sum(aligned * gt_dirs, -1), -1, 1))
    )
    assert np.median(ang) < 0.5, np.median(ang)


def _make_two_sheet_dataset(seed=0, n_per_sheet=6, k=12, w=320, h=240,
                            cell=0.03):
    """Two pattern sheets that NEVER share an image: sheet B is only ever
    seen alone, so it can only be initialized via the disconnected-sheet
    submodel path (reference: MakeNewSubmodelForKnownGeometry,
    dense_initialization.cc:1194-1205)."""
    rng = np.random.default_rng(seed)
    cam = pinhole.make_pinhole(0.9 * w, 0.9 * w, 0.5 * w, 0.5 * h, w, h)

    geoms = []
    sheet_pts = []
    for s in range(2):
        base = s * k * k
        geoms.append(
            KnownGeometry(
                cell_length_in_meters=cell,
                feature_id_to_position={
                    base + r * k + c: (c, r) for r in range(k) for c in range(k)
                },
            )
        )
        sheet_pts.append(
            np.array(
                [[c * cell, r * cell, 0.0] for r in range(k) for c in range(k)]
            )
        )
    center_off = (k - 1) * cell / 2

    imagesets = []
    for i in range(2 * n_per_sheet):
        s = i % 2  # alternate sheets; each image sees exactly one sheet
        q = se3.quat_exp(jnp.asarray(rng.normal(0, 0.12, 3)))
        r = np.asarray(se3.quat_to_matrix(q))
        t = np.array([
            -center_off + rng.normal(0, 0.05),
            -center_off + rng.normal(0, 0.05),
            rng.uniform(0.45, 0.7),
        ])
        x_cam = sheet_pts[s] @ r.T + t
        px, valid = pinhole.project(cam, jnp.asarray(x_cam))
        px, valid = np.asarray(px), np.asarray(valid)
        base = s * k * k
        feats = [
            PointFeature(xy=px[j], feature_id=base + j)
            for j in range(k * k)
            if valid[j]
        ]
        imagesets.append(Imageset(features=[feats]))
    ds = Dataset(
        num_cameras=1,
        image_sizes=[(w, h)],
        imagesets=imagesets,
        known_geometries=geoms,
    )
    return ds, cam


def test_dense_init_disconnected_sheet_submodel():
    """Sheets that never co-occur with the bootstrap sheet must still be
    initialized (identity-posed submodel) and their images localized —
    previously those sheets' features were silently dropped."""
    ds, cam = _make_two_sheet_dataset()
    init = DenseInitializer(
        ds, 0,
        DenseInitOptions(
            max_initialization_attempts=150, seed=1,
            min_matched_area_accept=0.15,
        ),
    )
    result = init.run()
    assert result is not None
    # both sheets have poses
    assert all(p is not None for p in result.global_tr_known_geometry)
    # images of BOTH sheets were localized
    used_sheets = {si % 2 for si, u in enumerate(result.image_used) if u}
    assert used_sheets == {0, 1}, used_sheets
    assert sum(result.image_used) >= 8, sum(result.image_used)

    # the direction field stays a valid single-camera calibration: both
    # components' camera-frame directions agree with pinhole GT up to one
    # global rotation
    dirs, valid = result.observation_directions()
    bw, bh = result.buffer_size
    w, h = result.image_size
    ys, xs = np.nonzero(valid)
    sel = np.arange(0, ys.size, max(1, ys.size // 3000))
    ys, xs = ys[sel], xs[sel]
    px_full = np.stack([(xs + 0.5) * w / bw, (ys + 0.5) * h / bh], -1)
    gt_dirs = np.asarray(pinhole.unproject(cam, jnp.asarray(px_full)))
    est = dirs[ys, xs]
    m = est.T @ gt_dirs
    u, _, vt = np.linalg.svd(m)
    d = np.sign(np.linalg.det(u @ vt))
    r_align = u @ np.diag([1, 1, d]) @ vt
    aligned = est @ r_align
    ang = np.degrees(np.arccos(np.clip(np.sum(aligned * gt_dirs, -1), -1, 1)))
    assert np.median(ang) < 1.0, np.median(ang)
