"""C++ data-path kernels vs their Python references."""
import math

import numpy as np
import pytest
from PIL import Image, ImageDraw

from pbe_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no toolchain)"
)


def _bezier_numpy(points, n):
    k = points.shape[0] - 1
    t = np.linspace(0.0, 1.0, n)[:, None]
    binom = np.array([math.comb(k, i) for i in range(k + 1)], np.float64)
    i = np.arange(k + 1)[None, :]
    return (binom[None, :] * (t**i) * ((1 - t) ** (k - i))) @ points


@pytest.mark.parametrize("degree", [1, 2, 3, 5])
def test_bezier_matches_numpy(degree):
    g = np.random.default_rng(degree)
    pts = g.uniform(0, 100, (degree + 1, 2))
    got = native.bezier_eval(pts, 33)
    want = _bezier_numpy(pts, 33)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_fill_polygon_close_to_pil():
    g = np.random.default_rng(0)
    # convex-ish polygon
    angles = np.sort(g.uniform(0, 2 * np.pi, 12))
    poly = np.stack([32 + 20 * np.cos(angles), 32 + 20 * np.sin(angles)], axis=1)
    got = native.fill_polygon(poly, 64, 64)
    img = Image.new("L", (64, 64), 0)
    ImageDraw.Draw(img).polygon([tuple(p) for p in poly.tolist()], fill=255)
    want = (np.asarray(img) > 127).astype(np.uint8)
    # rasterization conventions differ at edges; interiors must agree
    disagree = np.abs(got.astype(int) - want.astype(int)).sum()
    assert disagree / want.sum() < 0.08, disagree
    # center definitely inside
    assert got[32, 32] == 1


def test_mask_bbox_matches_python():
    from pbe_tpu.data.masks import mask_bbox as py_bbox

    m = np.zeros((40, 50, 1), np.float32)
    m[5:17, 8:30] = 1.0
    assert native.mask_bbox(m[..., 0]) == py_bbox(m) == (8, 5, 30, 17)
    assert native.mask_bbox(np.zeros((4, 4))) is None
