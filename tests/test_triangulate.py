"""Triangulation + exact non-convex intersection tests, fuzzed against the
raster oracle and hand-checked cases."""

import numpy as np
import pytest

from aquaculture_tpu.geo import polygon as P
from aquaculture_tpu.geo.polygon import _raster_boolean_area, intersection_area
from aquaculture_tpu.geo.triangulate import ear_clip, exact_intersection_area, signed_triangles


def _soup_area(tris):
    total = 0.0
    for t, s in tris:
        x, y = t[:, 0], t[:, 1]
        total += s * 0.5 * abs(
            (x[1] - x[0]) * (y[2] - y[0]) - (y[1] - y[0]) * (x[2] - x[0])
        )
    return total


def test_ear_clip_square():
    tris = ear_clip(np.asarray([(0, 0), (4, 0), (4, 4), (0, 4)]))
    assert len(tris) == 2
    assert sum(abs(0.5 * ((t[1,0]-t[0,0])*(t[2,1]-t[0,1]) - (t[1,1]-t[0,1])*(t[2,0]-t[0,0]))) for t in tris) == pytest.approx(16.0)


def test_ear_clip_concave_L():
    ring = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
    p = P.Polygon(ring)
    tris = ear_clip(np.asarray(ring))
    area = sum(abs(0.5*((t[1,0]-t[0,0])*(t[2,1]-t[0,1]) - (t[1,1]-t[0,1])*(t[2,0]-t[0,0]))) for t in tris)
    assert area == pytest.approx(p.area)


def test_signed_triangles_with_hole():
    p = P.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]])
    soup = signed_triangles(p)
    assert _soup_area(soup) == pytest.approx(100 - 16)


def test_exact_intersection_concave_pair():
    # two interlocking L-shapes (both non-convex, non-rectilinear after a
    # tiny shear so the rectilinear fast path doesn't engage)
    def shear(ring, k=0.01):
        return [(x + k * y, y) for x, y in ring]

    a = P.Polygon(shear([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]))
    b = P.Polygon(shear([(1, 1), (5, 1), (5, 3), (3, 3), (3, 5), (1, 5)]))
    exact = exact_intersection_area(a, b)
    oracle = _raster_boolean_area(a, b, "intersection", n=2048)
    assert exact == pytest.approx(oracle, rel=5e-3)
    # and through the public dispatch
    assert intersection_area(a, b) == pytest.approx(exact, rel=1e-12)


@pytest.mark.parametrize("seed", range(8))
def test_exact_intersection_fuzz_vs_raster(seed):
    rng = np.random.default_rng(500 + seed)

    def rand_star(cx, cy, r, k):
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.3 * r, r, k)
        return P.Polygon(np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1))

    a = rand_star(rng.uniform(30, 70), rng.uniform(30, 70), rng.uniform(10, 30), 9)
    b = rand_star(rng.uniform(30, 70), rng.uniform(30, 70), rng.uniform(10, 30), 9)
    exact = exact_intersection_area(a, b)
    oracle = _raster_boolean_area(a, b, "intersection", n=2048)
    assert exact == pytest.approx(oracle, abs=max(0.01 * max(a.area, b.area), 0.05))


def test_exact_intersection_disjoint_and_nested():
    a = P.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    far = P.Polygon([(100, 100), (110, 100), (105, 110)])
    assert exact_intersection_area(a, far) == 0.0
    inner = P.Polygon([(2, 2), (4, 2), (3, 4)])
    assert exact_intersection_area(a, inner) == pytest.approx(inner.area)
    assert exact_intersection_area(inner, a) == pytest.approx(inner.area)


def test_exact_intersection_at_projected_magnitudes():
    ox, oy = 3.4e6, -2.2e6
    a = P.Polygon([(ox, oy), (ox + 10, oy), (ox + 10, oy + 10), (ox, oy + 10)])
    tri = P.Polygon([(ox + 2, oy + 2), (ox + 8, oy + 2), (ox + 5, oy + 9)])
    assert exact_intersection_area(a, tri) == pytest.approx(tri.area, rel=1e-9)
