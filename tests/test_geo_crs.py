"""CRS transform tests against independent oracles.

pyproj is unavailable in this environment, so oracles are (a) EPSG-published
test points, (b) round-trip identities, (c) closed-form spherical Mercator
checks, and (d) equal-area invariants of the LAEA projection.
"""

import numpy as np
import pytest

from aquaculture_tpu.geo import crs


def test_mercator_known_points():
    # Null island
    x, y = crs.mercator_forward(0.0, 0.0)
    assert x == pytest.approx(0.0, abs=1e-9)
    assert y == pytest.approx(0.0, abs=1e-6)
    # lon=180 -> x = pi * R
    x, _ = crs.mercator_forward(180.0, 0.0)
    assert x == pytest.approx(np.pi * 6378137.0, rel=1e-12)
    # Paris (2.3522E, 48.8566N): cross-check the tan form against the
    # independent atanh(sin) identity y = R*atanh(sin(lat)).
    x, y = crs.mercator_forward(2.3522, 48.8566)
    assert x == pytest.approx(2.3522 / 180.0 * np.pi * 6378137.0, rel=1e-12)
    assert y == pytest.approx(6378137.0 * np.arctanh(np.sin(np.deg2rad(48.8566))), abs=1e-6)


def test_mercator_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y = crs.mercator_forward(lon, lat)
    lon2, lat2 = crs.mercator_inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_laea_projection_center():
    # Projection natural origin maps exactly to false easting/northing.
    e, n = crs.laea_forward(10.0, 52.0)
    assert e == pytest.approx(4321000.0, abs=1e-6)
    assert n == pytest.approx(3210000.0, abs=1e-6)


def test_laea_epsg_example():
    # IOGP Guidance Note 7-2 worked example for ETRS89-LAEA:
    # 50°00'00"N 5°00'00"E -> E 3962799.45, N 2999718.85
    e, n = crs.laea_forward(5.0, 50.0)
    assert e == pytest.approx(3962799.45, abs=0.02)
    assert n == pytest.approx(2999718.85, abs=0.02)
    # And the inverse
    lon, lat = crs.laea_inverse(3962799.45, 2999718.85)
    assert lon == pytest.approx(5.0, abs=1e-7)
    assert lat == pytest.approx(50.0, abs=1e-7)


def test_laea_roundtrip():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-10, 30, 1000)   # European extent
    lat = rng.uniform(35, 70, 1000)
    e, n = crs.laea_forward(lon, lat)
    lon2, lat2 = crs.laea_inverse(e, n)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_laea_equal_area_invariant():
    # LAEA must preserve areas: a small geodesic quad near Marseille should
    # have (ellipsoidal) area equal to its projected planar area to ~1e-6 rel.
    lon0, lat0 = 5.37, 43.29
    d = 0.01
    lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
    lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
    e, n = crs.laea_forward(lons, lats)
    planar = 0.5 * abs(np.sum(e * np.roll(n, -1) - np.roll(e, -1) * n))
    # Ellipsoidal area of a lon/lat quad via authalic sphere
    Rq = crs._RQ
    q = crs._authalic_q(np.sin(np.deg2rad(lats)))
    beta = np.arcsin(q / crs._QP)
    # Authalic-sphere area of the quad (approx by trapezoid in sin(beta))
    dlam = np.deg2rad(d)
    sphere_area = Rq**2 * dlam * (np.sin(beta[2]) - np.sin(beta[0]))
    assert planar == pytest.approx(sphere_area, rel=1e-4)


def test_transform_composition_3857_to_3035():
    # The geocoding path (reference geocode_results.py:177): 3857 -> 3035.
    # Check composition equals forward(inverse(.)) chain done manually.
    x, y = 600000.0, 5300000.0
    lon, lat = crs.mercator_inverse(x, y)
    e_ref, n_ref = crs.laea_forward(lon, lat)
    e, n = crs.transform(3857, 3035, x, y)
    assert e == pytest.approx(e_ref, abs=1e-9)
    assert n == pytest.approx(n_ref, abs=1e-9)


def test_transform_identity_and_errors():
    x, y = crs.transform(3857, 3857, 1.0, 2.0)
    assert x == 1.0 and y == 2.0
    with pytest.raises(ValueError):
        crs.transform(3857, 9999, 1.0, 2.0)


def test_transform_vectorized_shapes():
    xs = np.linspace(-1e6, 1e6, 7)
    ys = np.linspace(4e6, 6e6, 7)
    e, n = crs.transform(3857, 3035, xs, ys)
    assert e.shape == xs.shape
    lon, lat = crs.transform(3035, 4326, e, n)
    x2, y2 = crs.transform(4326, 3857, lon, lat)
    np.testing.assert_allclose(x2, xs, atol=1e-6)
    np.testing.assert_allclose(y2, ys, atol=1e-6)
