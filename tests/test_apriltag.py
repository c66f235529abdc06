"""AprilTag (tag36h11) detection tests on rendered tags."""

import numpy as np
import pytest

from camera_calibration_tpu.features import apriltag as at


def _embed_tag(tag_id, scale=12, angle=0.0, offset=(40, 30), noise=0.0,
               seed=0):
    rng = np.random.default_rng(seed)
    tag = at.render_tag(tag_id)  # 10x10, [0,1]
    h_img, w_img = 200, 240
    img = np.ones((h_img, w_img)) * 0.9
    # homography: tag frame [0,8]² (border) -> image; rotation about the
    # tag center (4,4) so the tag stays inside the image
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t1 = np.array([[1, 0, -4.0], [0, 1, -4.0], [0, 0, 1]])
    t2 = np.array(
        [[scale, 0, offset[0] + 4 * scale],
         [0, scale, offset[1] + 4 * scale],
         [0, 0, 1.0]]
    )
    h = t2 @ rot @ t1
    # render by inverse mapping
    yy, xx = np.meshgrid(np.arange(h_img) + 0.5, np.arange(w_img) + 0.5,
                         indexing="ij")
    hi = np.linalg.inv(h)
    q = np.einsum("ij,jkl->ikl", hi, np.stack([xx, yy, np.ones_like(xx)]))
    tx = q[0] / q[2]
    ty = q[1] / q[2]
    # tag frame [0,8] = border; full tag spans [-1, 9]
    inside = (tx >= -1) & (tx < 9) & (ty >= -1) & (ty < 9)
    ix = np.clip(np.floor(tx + 1).astype(int), 0, 9)
    iy = np.clip(np.floor(ty + 1).astype(int), 0, 9)
    img[inside] = tag[iy[inside], ix[inside]]
    if noise:
        img = np.clip(img + rng.normal(0, noise, img.shape), 0, 1)
    return img, h


@pytest.mark.parametrize("tag_id,angle", [(0, 0.0), (42, 0.3), (123, -0.7)])
def test_detect_rendered_tag(tag_id, angle):
    img, h_gt = _embed_tag(tag_id, angle=angle)
    dets = at.detect_tags(img)
    assert len(dets) == 1, [d.tag_id for d in dets]
    d = dets[0]
    assert d.tag_id == tag_id
    assert d.hamming == 0
    # corner 0 should map to tag frame (0,0)
    gt_corner = h_gt @ np.array([0.0, 0.0, 1.0])
    gt_corner = gt_corner[:2] / gt_corner[2]
    err = np.linalg.norm(d.corners[0] - gt_corner)
    assert err < 1.5, (d.corners, gt_corner)


def test_detect_with_noise():
    img, _ = _embed_tag(7, scale=14, angle=0.15, noise=0.03, seed=2)
    dets = at.detect_tags(img)
    assert len(dets) == 1
    assert dets[0].tag_id == 7


def test_roundtrip_all_rotations():
    for angle in (0.0, np.pi / 2, np.pi, -np.pi / 2):
        img, h_gt = _embed_tag(55, angle=angle, scale=12)
        dets = at.detect_tags(img)
        assert len(dets) == 1 and dets[0].tag_id == 55, angle
        gt_corner = h_gt @ np.array([0.0, 0.0, 1.0])
        gt_corner = gt_corner[:2] / gt_corner[2]
        assert np.linalg.norm(dets[0].corners[0] - gt_corner) < 1.5, angle
