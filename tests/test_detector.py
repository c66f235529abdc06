"""End-to-end feature detector test on a rendered tagged star pattern.

(reference analog: test/feature_detection_test.cc:48 — render the pattern
under a homography, run the full detector, measure sub-pixel accuracy)
"""

import numpy as np
import pytest

from camera_calibration_tpu.features import detector as fdet
from camera_calibration_tpu.features import pattern as pat


def _make_pattern_image(seed=0, square_px=26.0, n=12, noise=0.0,
                        angle=0.04, persp=2e-5):
    rng = np.random.default_rng(seed)
    spec = pat.PatternSpec(
        num_star_segments=16,
        squares_x=n,
        squares_y=n,
        square_length_in_meters=0.02,
        tags=[pat.AprilTagInfo(x=4, y=4, width=3, height=3, index=0)],
    )
    c, s = np.cos(angle), np.sin(angle)
    h_pp = np.array(
        [
            [square_px * c, -square_px * s, 2.2 * square_px],
            [square_px * s, square_px * c, 2.0 * square_px],
            [persp, -persp, 1.0],
        ]
    )
    w = int(square_px * (n + 3))
    h = int(square_px * (n + 3))
    img = pat.render_pattern(
        spec, np.linalg.inv(h_pp), (w, h), supersample=4,
        tag_renderer=pat.make_tag_renderer(spec),
    )
    if noise:
        img = np.clip(img + rng.normal(0, noise, img.shape), 0, 1)
    return spec, img, h_pp


def _gt_positions(spec, h_pp):
    out = {}
    for coord in spec.valid_feature_coords():
        q = h_pp @ np.array([coord[0], coord[1], 1.0])
        out[coord] = q[:2] / q[2]  # pixel-corner convention
    return out


def test_detector_full_pattern():
    spec, img, h_pp = _make_pattern_image()
    gt = _gt_positions(spec, h_pp)
    det = fdet.FeatureDetector([spec])
    features, per_pattern = det.detect(img)

    n_valid = spec.feature_count()
    assert len(features) > 0.7 * n_valid, (len(features), n_valid)

    corner_map = pat.corners_for_patterns([spec])[0]
    errs = []
    for f in features:
        coord = corner_map[f.feature_id]
        errs.append(np.linalg.norm(f.xy - gt[coord]))
    errs = np.asarray(errs)
    assert np.median(errs) < 0.05, np.median(errs)
    assert errs.max() < 0.5, errs.max()


def test_detector_with_noise():
    spec, img, h_pp = _make_pattern_image(seed=4, noise=0.02)
    gt = _gt_positions(spec, h_pp)
    det = fdet.FeatureDetector([spec])
    features, _ = det.detect(img)
    assert len(features) > 0.6 * spec.feature_count()
    corner_map = pat.corners_for_patterns([spec])[0]
    errs = np.asarray(
        [np.linalg.norm(f.xy - gt[corner_map[f.feature_id]]) for f in features]
    )
    assert np.median(errs) < 0.1, np.median(errs)


def test_detector_harsh_conditions():
    """Blur + vignetting + noise — closer to a real camera image."""
    import cv2

    spec, img, h_pp = _make_pattern_image(seed=9, noise=0.0)
    h, w = img.shape
    # optical blur, strong vignette, sensor noise
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
    img = img * (1.0 - 0.35 * r2)
    rng = np.random.default_rng(10)
    img = np.clip(img + rng.normal(0, 0.03, img.shape), 0, 1)

    gt = _gt_positions(spec, h_pp)
    det = fdet.FeatureDetector([spec])
    features, _ = det.detect(img)
    assert len(features) > 0.5 * spec.feature_count(), len(features)
    corner_map = pat.corners_for_patterns([spec])[0]
    errs = np.asarray(
        [np.linalg.norm(f.xy - gt[corner_map[f.feature_id]]) for f in features]
    )
    assert np.median(errs) < 0.15, np.median(errs)
    assert (errs < 1.0).mean() > 0.95, (errs < 1.0).mean()


def test_detector_gradient_refinement():
    """The gradient-image symmetry refinement path (reference's
    RefinementByGradient variants)."""
    spec, img, h_pp = _make_pattern_image(seed=12, noise=0.01)
    gt = _gt_positions(spec, h_pp)
    det = fdet.FeatureDetector(
        [spec], fdet.DetectorOptions(refinement_type="gradient")
    )
    features, _ = det.detect(img)
    assert len(features) > 0.6 * spec.feature_count(), len(features)
    corner_map = pat.corners_for_patterns([spec])[0]
    errs = np.asarray(
        [np.linalg.norm(f.xy - gt[corner_map[f.feature_id]]) for f in features]
    )
    assert np.median(errs) < 0.1, np.median(errs)


def test_pattern_pdf_matches_raster_oracle(tmp_path):
    """The vector PDF drawing must reproduce the intensity oracle.

    Rasterize the same matplotlib figure to PNG and compare per-pixel
    against render_pattern (reference PDF generator analog:
    scripts/create_calibration_pattern.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    spec = pat.PatternSpec(
        num_star_segments=16, squares_x=8, squares_y=6,
        square_length_in_meters=0.02,
        tags=[pat.AprilTagInfo(x=3, y=2, width=2, height=2, index=0)],
    )
    pdf_path = tmp_path / "pattern.pdf"
    pat.save_pattern_pdf(spec, str(pdf_path))
    assert pdf_path.stat().st_size > 4000

    # draw to PNG through the same code path
    png_path = tmp_path / "pattern.png"
    pat.save_pattern_pdf(spec, str(png_path))  # matplotlib infers format
    import matplotlib.pyplot as plt
    img = plt.imread(str(png_path))
    gray = img[..., :3].mean(-1)
    h_px, w_px = gray.shape

    # map PNG pixels -> pattern coords (margin 0.005 m, cell 0.02 m)
    cell_m, margin = 0.02, 0.005
    x0p, y0p = -1.0, -1.0
    wm = (spec.squares_x) * cell_m + 2 * margin
    hm = (spec.squares_y) * cell_m + 2 * margin
    xs = (np.arange(w_px) + 0.5) / w_px * wm - margin
    ys = (np.arange(h_px) + 0.5) / h_px * hm - margin
    gx, gy = np.meshgrid(x0p + xs / cell_m, y0p + ys / cell_m)
    inside = (
        (gx > -0.9) & (gx < spec.squares_x - 1.1)
        & (gy > -0.9) & (gy < spec.squares_y - 1.1)
    )
    ref = spec.intensity(np.stack([gx, gy], -1))
    renderer = pat.make_tag_renderer(spec)
    ref = renderer(np.stack([gx, gy], -1), ref)
    # exclude pixels near black/white boundaries (rasterization edges)
    from scipy.ndimage import minimum_filter, maximum_filter
    flat = minimum_filter(ref, 5) == maximum_filter(ref, 5)
    m = inside & flat
    match = np.abs(gray[m] - ref[m]) < 0.5
    # residual mismatches are rasterization-edge pixels (tag cell borders
    # at this dpi); the wedge+tag geometry itself matches exactly
    assert match.mean() > 0.99, match.mean()


def test_detect_batch_matches_single():
    """Cross-image batched detection (rings of all images refined in one
    device call per round) must reproduce per-image detection — the batch
    analog of the reference's real-time per-image GPU detection
    (Readme.md:42,188-189)."""
    pairs = [_make_pattern_image(seed=s, noise=0.01) for s in (0, 5)]
    spec = pairs[0][0]
    det = fdet.FeatureDetector([spec])
    results = det.detect_batch([img for _, img, _ in pairs])
    det_single = fdet.FeatureDetector([spec])
    for (spec_, img, h_pp), (feats_b, dets_b) in zip(pairs, results):
        feats_s, _ = det_single.detect(img)
        ids_b = {f.feature_id for f in feats_b}
        ids_s = {f.feature_id for f in feats_s}
        assert ids_b == ids_s
        gt = _gt_positions(spec_, h_pp)
        cm = pat.corners_for_patterns([spec_])[0]
        errs = np.asarray(
            [np.linalg.norm(f.xy - gt[cm[f.feature_id]]) for f in feats_b]
        )
        assert np.median(errs) < 0.05, np.median(errs)


# ---------------------- validation-pass unit tests ----------------------
# (reference: feature_detector_tagged_pattern.cc:362-560 — near-border
# strict quartile threshold, opposite angle/length triples, perpendicular
# -direction consistency, loop-until-stable deletion)


def _validator(**opt_kw):
    """A FeatureDetector shell exposing _validate without pattern setup."""
    det = object.__new__(fdet.FeatureDetector)
    det.opts = fdet.DetectorOptions(**opt_kw)
    return det


def _lattice(nx, ny, origin, step, cost=0.01):
    dets = {}
    for y in range(ny):
        for x in range(nx):
            pos = np.array(
                [origin[0] + step[0] * x, origin[1] + step[1] * y], float
            )
            dets[(x, y)] = fdet.FeatureDetection(
                position=pos, coord=(x, y), cost=cost + 1e-4 * ((x + y) % 5)
            )
    return dets


def test_validate_near_border_strict_quartile():
    """A refinement-cost outlier NEAR THE BORDER must be removed at the
    stricter threshold while an interior feature with the SAME cost
    survives the lenient global threshold (cc:396-446)."""
    det = _validator()
    # row 0 sits at y=15 < 2*window_half_size=20 -> near-border
    dets = _lattice(10, 10, origin=(45.0, 15.0), step=(30.0, 30.0))
    mid_cost = 0.011  # between q3 + 1*iqr and q3 + 6*iqr
    dets[(5, 0)] = fdet.FeatureDetection(
        position=dets[(5, 0)].position, coord=(5, 0), cost=mid_cost
    )
    dets[(5, 5)] = fdet.FeatureDetection(
        position=dets[(5, 5)].position, coord=(5, 5), cost=mid_cost
    )
    costs = np.sort([d.cost for d in dets.values()])
    n = costs.size
    q1 = costs[int(0.25 * n + 0.5)]
    q3 = costs[int(0.75 * n + 0.5)]
    assert q3 + 1.0 * (q3 - q1) < mid_cost < q3 + 6.0 * (q3 - q1)

    out = det._validate(dets, (400, 400))
    assert (5, 0) not in out, "near-border outlier survived"
    assert (5, 5) in out, "interior feature with same cost was removed"
    assert len(out) == len(dets) - 1


def test_validate_perpendicular_direction_consistency():
    """A lattice whose perpendicular (cross-row) direction jumps by >25
    deg across a seam — each row individually straight, spacing ratios
    within limits, so the collinearity triples all pass — must lose the
    seam features to the perpendicular-direction check (cc:500-560)."""
    det = _validator()
    # 2 rows (no vertical triples => collinearity cannot fire vertically),
    # horizontal step 30, vertical step 20.  Shift row 1 for x >= 6 by
    # +14 px: row-1 spacing ratio at the seam = 44/30 = 1.47 < 1.5 and
    # the rows stay straight, but the vertical chord goes from (0,20) to
    # (14,20) = 35 deg > 25 deg between columns 5 and 6.
    dets = _lattice(12, 2, origin=(40.0, 60.0), step=(30.0, 20.0))
    for x in range(6, 12):
        d = dets[(x, 1)]
        dets[(x, 1)] = fdet.FeatureDetection(
            position=d.position + np.array([14.0, 0.0]),
            coord=(x, 1), cost=d.cost,
        )
    out = det._validate(dets, (600, 200))
    # the seam is direction-inconsistent: the features whose perpendicular
    # chords disagree >25 deg across the seam must be removed (the check
    # is symmetric, so both seam columns go — like the reference's
    # triple deletion, "we do not know which is the problem")
    assert (5, 0) not in out
    assert len(dets) - len(out) <= 4
    # the interiors of both half-lattices are internally consistent
    for x in (0, 1, 2, 3, 8, 9, 10, 11):
        assert (x, 0) in out and (x, 1) in out, x


def test_validate_jumped_feature_and_clean_lattice():
    """A feature that jumped to a wrong local minimum (half-cell diagonal
    displacement) is deleted by the stable-deletion loop without eroding
    the healthy lattice; an undisturbed lattice passes through intact."""
    det = _validator()
    clean = _lattice(10, 10, origin=(45.0, 45.0), step=(30.0, 30.0))
    out = det._validate(dict(clean), (400, 400))
    assert len(out) == len(clean)

    bad = dict(clean)
    d = bad[(4, 4)]
    bad[(4, 4)] = fdet.FeatureDetection(
        position=d.position + np.array([15.0, 15.0]), coord=(4, 4),
        cost=d.cost,
    )
    out = det._validate(bad, (400, 400))
    assert (4, 4) not in out
    assert len(out) >= 0.9 * len(bad)
