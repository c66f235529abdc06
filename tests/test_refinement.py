"""Corner-refinement accuracy on rendered synthetic star patterns.

(reference analog: test/feature_detection_test.cc:48 — render the pattern
under a homography, refine, measure sub-pixel bias)
"""

import jax.numpy as jnp
import numpy as np

from camera_calibration_tpu.features import pattern as pat
from camera_calibration_tpu.features import refinement as ref


def _setup(seed=0, n_side=6, square_px=24.0, whs=10, noise=0.0, persp=1e-4):
    rng = np.random.default_rng(seed)
    spec = pat.PatternSpec(
        num_star_segments=16, squares_x=n_side + 1, squares_y=n_side + 1,
        square_length_in_meters=0.02,
    )
    # pattern->pixel homography: scale + slight rotation + perspective
    ang = 0.06
    h_pp = np.array(
        [
            [square_px * np.cos(ang), -square_px * np.sin(ang), 40.0],
            [square_px * np.sin(ang), square_px * np.cos(ang), 36.0],
            [persp, -persp * 0.7, 1.0],
        ]
    )
    w = int(square_px * (n_side + 2))
    h = int(square_px * (n_side + 2))
    img = pat.render_pattern(spec, np.linalg.inv(h_pp), (w, h), supersample=4)
    if noise:
        img = np.clip(img + rng.normal(0, noise, img.shape), 0.0, 1.0)

    coords = [
        (x, y) for x, y in spec.valid_feature_coords()
        if 1 <= x <= n_side - 2 and 1 <= y <= n_side - 2
    ]
    gt = []
    h_locals = []
    for (fx, fy) in coords:
        q = h_pp @ np.array([fx, fy, 1.0])
        gt.append(q[:2] / q[2])
        t = np.eye(3)
        t[0, 2], t[1, 2] = fx, fy
        h_locals.append(h_pp @ t)
    gt = np.stack(gt)  # pixel-corner convention
    h_locals = np.stack(h_locals)
    return spec, img, gt, h_locals, whs, rng


def _samples_for(h_locals, positions_center, whs, rng, count=600):
    """Map pixel-window offsets into pattern space via the local homography."""
    n = h_locals.shape[0]
    offs = rng.uniform(-1.0, 1.0, (count, 2)) * whs
    pattern_samples = np.zeros((n, count, 2))
    for i in range(n):
        h_inv = np.linalg.inv(h_locals[i])
        p = np.concatenate(
            [positions_center[i] + offs, np.ones((count, 1))], -1
        )
        q = p @ h_inv.T
        pattern_samples[i] = q[:, :2] / q[:, 2:3]
    return pattern_samples


def test_symmetry_refinement_subpixel():
    spec, img, gt, h_locals, whs, rng = _setup()
    gt_center = gt - 0.5  # pixel-center convention
    init = gt_center + rng.uniform(-1.0, 1.0, gt_center.shape)
    samples = _samples_for(h_locals, gt_center, whs, rng)
    pos, cost, conv = ref.refine_features_symmetry(
        jnp.asarray(img),
        jnp.asarray(init),
        jnp.asarray(h_locals),
        jnp.asarray(samples),
        jnp.ones(samples.shape[:2], bool),
        whs,
    )
    conv = np.asarray(conv)
    assert conv.mean() > 0.9, conv.mean()
    err = np.linalg.norm(np.asarray(pos)[conv] - gt_center[conv], axis=-1)
    assert np.median(err) < 0.05, np.median(err)
    bias = np.abs((np.asarray(pos)[conv] - gt_center[conv]).mean(0))
    assert bias.max() < 0.02, bias


def test_symmetry_refinement_with_noise():
    spec, img, gt, h_locals, whs, rng = _setup(seed=3, noise=0.02)
    gt_center = gt - 0.5
    init = gt_center + rng.uniform(-0.8, 0.8, gt_center.shape)
    samples = _samples_for(h_locals, gt_center, whs, rng)
    pos, cost, conv = ref.refine_features_symmetry(
        jnp.asarray(img),
        jnp.asarray(init),
        jnp.asarray(h_locals),
        jnp.asarray(samples),
        jnp.ones(samples.shape[:2], bool),
        whs,
    )
    conv = np.asarray(conv)
    assert conv.mean() > 0.8, conv.mean()
    err = np.linalg.norm(np.asarray(pos)[conv] - gt_center[conv], axis=-1)
    assert np.median(err) < 0.1, np.median(err)


def test_matching_refinement():
    spec, img, gt, h_locals, whs, rng = _setup(seed=5)
    gt_center = gt - 0.5
    init = gt_center + rng.uniform(-1.5, 1.5, gt_center.shape)
    samples = _samples_for(h_locals, gt_center, whs, rng, count=300)
    # rendered pattern intensities at the samples (matching-stage target);
    # note the image is dark-on-white with intensity()=1 white
    rendered = spec.intensity(samples)
    pos, cost, conv = ref.refine_features_matching(
        jnp.asarray(img),
        jnp.asarray(init),
        jnp.asarray(h_locals),
        jnp.asarray(samples),
        jnp.asarray(rendered),
        jnp.ones(samples.shape[:2], bool),
        whs,
    )
    conv = np.asarray(conv)
    assert conv.mean() > 0.8, conv.mean()
    err = np.linalg.norm(np.asarray(pos)[conv] - gt_center[conv], axis=-1)
    # matching is the coarse stage: sub-0.3 px is enough to seed symmetry
    assert np.median(err) < 0.3, np.median(err)
