"""imageproc/imageio geometry tests with analytically-known expectations."""

import numpy as np
import pytest

from rten_tpu.imageproc import (
    Rect,
    bounding_rect,
    convex_hull,
    draw_line,
    draw_polygon,
    fill_rect,
    find_contours,
    min_area_rect,
    normalize_image,
    polygon_area,
    simplify_polygon,
)
from rten_tpu.imageio import image_to_tensor, tensor_to_image


def test_rect_ops():
    a = Rect(0, 0, 10, 10)
    b = Rect(5, 5, 15, 15)
    assert a.area == 100
    assert a.intersects(b)
    assert a.intersection(b).area == 25
    assert a.union(b) == Rect(0, 0, 15, 15)
    assert abs(a.iou(b) - 25 / 175) < 1e-9
    assert a.iou(Rect(20, 20, 30, 30)) == 0.0


def test_find_contours_square():
    mask = np.zeros((12, 12), np.uint8)
    mask[2:7, 3:9] = 1
    contours = find_contours(mask)
    assert len(contours) == 1
    r = bounding_rect(contours[0])
    assert (r.top, r.left, r.bottom, r.right) == (2, 3, 7, 9)
    # Border length of a 5x6 rect = 2*(5+6) - 4 points.
    assert len(contours[0]) == 2 * (5 + 6) - 4


def test_find_contours_two_blobs():
    mask = np.zeros((10, 20), np.uint8)
    mask[1:4, 1:5] = 1
    mask[6:9, 10:18] = 1
    contours = find_contours(mask)
    assert len(contours) == 2
    rects = sorted(
        (bounding_rect(c) for c in contours), key=lambda r: r.left
    )
    assert (rects[0].top, rects[0].left) == (1, 1)
    assert (rects[1].top, rects[1].left) == (6, 10)


def test_polygon_area_and_simplify():
    square = np.asarray([(0, 0), (0, 10), (10, 10), (10, 0)])
    assert polygon_area(square) == 100.0
    # Collinear midpoints simplify away.
    poly = np.asarray([(0, 0), (0, 5), (0, 10), (10, 10), (10, 0)])
    simp = simplify_polygon(poly, 0.5)
    assert len(simp) == 4
    assert (0, 5) not in {tuple(p) for p in simp}


def test_convex_hull_and_min_area_rect():
    pts = np.asarray([(0, 0), (0, 4), (4, 0), (4, 4), (2, 2), (1, 3)])
    hull = convex_hull(pts)
    assert {tuple(p) for p in hull} == {(0, 0), (0, 4), (4, 0), (4, 4)}
    rect = min_area_rect(pts)
    # Axis-aligned square of side 4 -> area 16.
    d1 = np.hypot(*(rect[1] - rect[0]))
    d2 = np.hypot(*(rect[3] - rect[0]))
    assert abs(d1 * d2 - 16.0) < 1e-6

    # Rotated line of points: min rect should be thin.
    diag = np.asarray([(i, i) for i in range(10)] + [(i + 1, i) for i in range(9)])
    rect = min_area_rect(diag)
    sides = sorted([np.hypot(*(rect[1] - rect[0])), np.hypot(*(rect[3] - rect[0]))])
    assert sides[0] < 1.1  # ~1/sqrt(2) thin

def test_drawing():
    img = np.zeros((10, 10), np.uint8)
    draw_line(img, (0, 0), (0, 9), 255)
    assert img[0].sum() == 255 * 10
    img2 = np.zeros((10, 10), np.uint8)
    draw_polygon(img2, [(1, 1), (1, 8), (8, 8), (8, 1)], 7)
    assert img2[1, 1] == 7 and img2[8, 8] == 7 and img2[4, 1] == 7
    fill_rect(img2, Rect(2, 2, 5, 5), 9)
    assert (img2[2:5, 2:5] == 9).all()


def test_normalize_and_io_roundtrip(tmp_path):
    hwc = (np.random.default_rng(0).random((8, 6, 3)) * 255).astype(np.uint8)
    chw = image_to_tensor(hwc)
    assert chw.shape == (3, 8, 6) and chw.max() <= 1.0
    back = tensor_to_image(chw)
    np.testing.assert_array_equal(back, hwc)
    norm = normalize_image(chw, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    assert norm.shape == chw.shape
    np.testing.assert_allclose(norm[0], (chw[0] - 0.5) / 0.25, rtol=1e-6)

    from rten_tpu.imageio import read_image, write_image

    p = str(tmp_path / "img.png")
    write_image(p, chw)
    loaded = read_image(p)
    np.testing.assert_allclose(loaded, chw, atol=1 / 255)
