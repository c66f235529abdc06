"""Patch-resident refinement vs whole-image refinement equivalence.

The hat-weight matmul sampler must reproduce floor-based bilinear
interpolation exactly, so both refinement implementations must agree on
identical inputs (away from image borders).
"""

import numpy as np
import jax.numpy as jnp

from camera_calibration_tpu.features import patch_refinement as pr
from camera_calibration_tpu.features import refinement as ref
from camera_calibration_tpu.ops import interp


def test_sample_patches_matches_bilinear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 72))
    centers = rng.uniform(20, 44, (5, 2))
    patch = 24
    patches, origins = pr.extract_patches_host(img, centers, patch)
    xy_img = centers[:, None, :] + rng.uniform(-8, 8, (5, 40, 2))
    xy_loc = jnp.asarray(xy_img - origins[:, None, :])
    val, grad, ok = pr.sample_patches(jnp.asarray(patches), xy_loc)
    ref_val, ref_grad = interp.bilinear_with_jacobian(
        jnp.asarray(img), jnp.asarray(xy_img)
    )
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               atol=1e-12)


def _symmetric_test_image(rng, h=96, w=96):
    """Image with point symmetry around (47.3, 48.6) + smooth background."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    cx, cy = 47.3, 48.6
    ang = np.arctan2(yy - cy, xx - cx)
    r = np.hypot(yy - cy, xx - cx)
    img = 0.5 + 0.5 * np.cos(8 * ang) * np.exp(-r / 40.0)
    img += 0.02 * rng.standard_normal((h, w))
    return np.clip(img, 0, 1), np.array([cx, cy])


def test_symmetry_refinement_patch_equals_image():
    rng = np.random.default_rng(1)
    img, center = _symmetric_test_image(rng)
    n = 6
    positions = center[None, :] + rng.uniform(-1.5, 1.5, (n, 2))
    h0 = np.tile(np.eye(3), (n, 1, 1))
    h0[:, 0, 0] = 1.0 + rng.uniform(-0.05, 0.05, n)
    h0[:, 1, 1] = 1.0 + rng.uniform(-0.05, 0.05, n)
    whs = 8
    offs = ref.make_sample_offsets(rng, whs, 128) * whs
    samples = np.tile(offs[None], (n, 1, 1))
    sv = np.ones((n, offs.shape[0]), bool)

    pos_a, cost_a, ok_a = ref.refine_features_symmetry(
        jnp.asarray(img), jnp.asarray(positions), jnp.asarray(h0),
        jnp.asarray(samples), jnp.asarray(sv), whs,
    )
    patch = pr.patch_size_for_window(whs)
    patches, origins = pr.extract_patches_host(img, positions, patch)
    pos_b, cost_b, ok_b = pr.refine_symmetry_patches(
        jnp.asarray(patches), jnp.asarray(origins), jnp.asarray(positions),
        jnp.asarray(h0), jnp.asarray(samples), jnp.asarray(sv), whs,
    )
    assert np.array_equal(np.asarray(ok_a), np.asarray(ok_b))
    np.testing.assert_allclose(np.asarray(pos_b), np.asarray(pos_a),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(cost_b), np.asarray(cost_a),
                               rtol=1e-9, atol=1e-12)
    # and they actually converged near the true center
    errs = np.linalg.norm(np.asarray(pos_b) - center, axis=1)
    assert np.median(errs[np.asarray(ok_b)]) < 0.2


def test_matching_refinement_patch_equals_image():
    rng = np.random.default_rng(2)
    img, center = _symmetric_test_image(rng)
    n = 5
    positions = center[None, :] + rng.uniform(-2.0, 2.0, (n, 2))
    h0 = np.tile(np.eye(3), (n, 1, 1))
    whs = 8
    offs = ref.make_sample_offsets(rng, whs, 64) * whs
    samples = np.tile(offs[None], (n, 1, 1))
    sv = np.ones((n, offs.shape[0]), bool)
    # "rendered" template: the image itself sampled at GT-centered offsets
    tmpl = np.asarray(interp.bilinear(
        jnp.asarray(img), jnp.asarray(center[None, None, :] + offs[None])
    ))[0]
    rendered = np.tile(tmpl[None], (n, 1))

    pos_a, cost_a, ok_a = ref.refine_features_matching(
        jnp.asarray(img), jnp.asarray(positions), jnp.asarray(h0),
        jnp.asarray(samples), jnp.asarray(rendered), jnp.asarray(sv), whs,
    )
    patch = pr.patch_size_for_window(whs)
    patches, origins = pr.extract_patches_host(img, positions, patch)
    pos_b, cost_b, ok_b = pr.refine_matching_patches(
        jnp.asarray(patches), jnp.asarray(origins), jnp.asarray(positions),
        jnp.asarray(h0), jnp.asarray(samples), jnp.asarray(rendered),
        jnp.asarray(sv), whs,
    )
    assert np.array_equal(np.asarray(ok_a), np.asarray(ok_b))
    np.testing.assert_allclose(np.asarray(pos_b), np.asarray(pos_a),
                               atol=1e-9)
    errs = np.linalg.norm(np.asarray(pos_b) - center, axis=1)
    assert np.median(errs[np.asarray(ok_b)]) < 0.5
