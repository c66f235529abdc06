"""Native C++ components: availability + equivalence with NumPy paths."""

import numpy as np

from camera_calibration_tpu import native
from camera_calibration_tpu.features import pattern as pat


def test_native_builds():
    assert native.available(), "g++ compile of the native module failed"


def test_pattern_intensity_matches_python():
    spec = pat.PatternSpec(
        num_star_segments=16, squares_x=10, squares_y=10,
        square_length_in_meters=0.02,
    )
    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 12, (5000, 2))
    py = spec.intensity(pos)
    nat = native.pattern_intensity_native(pos, 16)
    # boundary pixels may differ by FP rounding of the segment index
    agree = np.mean(py == nat)
    assert agree > 0.999, agree


def test_densify_native_matches_numpy():
    import jax

    from camera_calibration_tpu.init import dense_init

    rng = np.random.default_rng(1)
    # synthetic features on a grid with an affine image mapping
    from camera_calibration_tpu.ba.dataset import KnownGeometry, PointFeature

    k = 8
    geometry = KnownGeometry(
        cell_length_in_meters=0.05,
        feature_id_to_position={r * k + c: (c, r) for r in range(k) for c in range(k)},
    )
    a_mat = np.array([[21.0, 1.5], [-1.0, 19.0]])
    b_vec = np.array([30.0, 25.0])
    feats = []
    for fid, (c, r) in geometry.feature_id_to_position.items():
        px = a_mat @ np.array([c, r], float) + b_vec
        feats.append(PointFeature(xy=px + rng.normal(0, 0.1, 2), feature_id=fid))
    pose = (np.eye(3), np.array([0.1, -0.2, 0.3]))

    pts_n, valid_n = dense_init.densify_matches(
        feats, [geometry], [pose], (240, 200), (240, 200)
    )
    assert native.available()
    # force the numpy fallback
    orig = native._lib
    try:
        native._lib = None
        native._tried = True
        pts_p, valid_p = dense_init.densify_matches(
            feats, [geometry], [pose], (240, 200), (240, 200)
        )
    finally:
        native._lib = orig
    assert valid_n.sum() > 1000
    # coverage may differ by boundary pixels only
    agree = (valid_n == valid_p).mean()
    assert agree > 0.995, agree
    both = valid_n & valid_p
    np.testing.assert_allclose(pts_n[both], pts_p[both], atol=1e-9)
