"""aq-acquire: the reference's four L1 scripts as a command surface
(reference: src/load_data/*.py __main__ blocks). Network transports are
monkeypatched; everything else runs the real file IO."""

import io
import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from aquaculture_tpu.cli import acquire as cli_acquire


def _geojson(path, geoms, props=None, crs=None):
    feats = []
    for i, g in enumerate(geoms):
        feats.append({
            "type": "Feature",
            "properties": (props[i] if props else {"i": i}),
            "geometry": g,
        })
    fc = {"type": "FeatureCollection", "features": feats}
    if crs:
        # a CRS-less GeoJSON reads as 4326; meter-scale test coords MUST
        # declare 3857 or to_crs(3857) blows the WMS grid up to ~1e5 boxes
        fc["crs"] = {"type": "name",
                     "properties": {"name": f"urn:ogc:def:crs:EPSG::{crs}"}}
    with open(path, "w") as f:
        json.dump(fc, f)


def test_acquire_shapefiles_offline(tmp_path, monkeypatch):
    def fake_fetch(url):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("x.txt", url)
        return buf.getvalue()

    monkeypatch.setattr(
        "aquaculture_tpu.acquire.shapefiles._default_fetch", fake_fetch
    )
    cli_acquire.main(["shapefiles", "--out", str(tmp_path)])
    assert os.path.exists(tmp_path / "raw" / "europe_coastline" / "x.txt")
    assert os.path.exists(tmp_path / "raw" / "france_grid" / "x.txt")
    # resumable: second run skips (fetch that raises proves no re-download)
    monkeypatch.setattr(
        "aquaculture_tpu.acquire.shapefiles._default_fetch",
        lambda url: (_ for _ in ()).throw(AssertionError("re-downloaded")),
    )
    cli_acquire.main(["shapefiles", "--out", str(tmp_path)])


class _FakeWms:
    """Returns a non-blank PNG for any request (probe and full)."""

    calls = 0

    def __init__(self, url=None, timeout=0):
        pass

    def getmap(self, layer, bbox, size):
        _FakeWms.calls += 1
        rng = np.random.default_rng(int(abs(bbox[0])) % 1000)
        a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(a).save(buf, format="PNG")
        return buf.getvalue()


def test_acquire_wms_offline(tmp_path, monkeypatch):
    monkeypatch.setattr("aquaculture_tpu.acquire.wms.HttpWmsTransport", _FakeWms)
    coast = tmp_path / "coast.geojson"
    _geojson(coast, [{
        "type": "Polygon",
        "coordinates": [[[0, 0], [2000, 0], [2000, 1000], [0, 1000], [0, 0]]],
    }], crs=3857)
    bboxes_csv = tmp_path / "wanted_bboxes.csv"
    cli_acquire.main([
        "wms", "--coast", str(coast), "--years", "2014",
        "--store", str(tmp_path / "store"), "--bboxes-out", str(bboxes_csv),
    ])
    tifs = list((tmp_path / "store" / "coastal_french_data" / "tifs").iterdir())
    assert len(tifs) >= 1  # a 2000x1000 m shape tiles into >= 2 1200 m boxes
    assert all(t.name.startswith("ORTHOIMAGERY.ORTHOPHOTOS2014_") for t in tifs)

    # the emitted wanted_bboxes.csv feeds cli.geocode directly
    from aquaculture_tpu.cli.geocode import load_download_bboxes

    dl = load_download_bboxes(str(bboxes_csv))
    assert len(dl) == len(tifs) and dl.crs == 3857

    # resumable: a second run downloads nothing new
    before = _FakeWms.calls
    cli_acquire.main([
        "wms", "--coast", str(coast), "--years", "2014",
        "--store", str(tmp_path / "store"),
    ])
    assert _FakeWms.calls == before


ASC = """ncols 4
nrows 3
xllcorner {x0}
yllcorner 0.0
cellsize 1.0
NODATA_value -9999
1 2 3 4
5 6 7 8
9 10 -9999 12
"""


def test_acquire_bathymetry_local_asc(tmp_path):
    a1 = tmp_path / "F4_2022.asc"
    a2 = tmp_path / "F5_2022.asc"
    a1.write_text(ASC.format(x0=0.0))
    a2.write_text(ASC.format(x0=4.0))
    out = tmp_path / "bathy" / "EMOD.tif"
    cli_acquire.main([
        "bathymetry", "--out", str(out), "--asc", str(a1), str(a2),
    ])
    from aquaculture_tpu.data.geotiff import read_geotiff

    g = read_geotiff(str(out))
    assert g.array.shape[:2] == (3, 8)  # two 4-col grids mosaicked side by side


def test_acquire_landfilter_end_to_end(tmp_path):
    # coastline linework: two closed square loops (mainland + island),
    # country footprint covering both, no EEZ
    main_loop = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    island = [[20, 0], [24, 0], [24, 4], [20, 4], [20, 0]]
    coast = tmp_path / "coast.geojson"
    _geojson(coast, [
        {"type": "LineString", "coordinates": main_loop},
        {"type": "LineString", "coordinates": island},
    ])
    country = tmp_path / "country.geojson"
    _geojson(country, [{
        "type": "Polygon",
        "coordinates": [[[-1, -1], [30, -1], [30, 12], [-1, 12], [-1, -1]]],
    }])
    out = tmp_path / "land.geojson"
    cli_acquire.main([
        "landfilter", "--coastline", str(coast), "--country", str(country),
        "--out", str(out),
    ])
    from aquaculture_tpu import frame as gf

    land = gf.read_file(str(out))
    assert len(land) == 2
    assert sorted(land["kind"]) == ["island", "primary"]
    areas = sorted(g.area for g in land["geometry"])
    assert areas == pytest.approx([16.0, 100.0])


def test_linestring_io_roundtrip():
    """LineString/MultiLineString WKT + GeoJSON codec (added for the
    coastline file surface of aq-acquire landfilter)."""
    from aquaculture_tpu.geo import io as gio
    from aquaculture_tpu.geo import polygon as _poly

    ls = _poly.LineString([[0, 0], [1.5, 2.5], [3, 0]])
    mls = _poly.MultiLineString([[[0, 0], [1, 1]], [[2, 2], [3, 3], [4, 2]]])
    for g in (ls, mls):
        w = gio.from_wkt(gio.to_wkt(g))
        j = gio.geometry_from_geojson(gio.geometry_to_geojson(g))
        for back in (w, j):
            assert type(back) is type(g)
            if isinstance(g, _poly.LineString):
                np.testing.assert_allclose(back.coords, g.coords)
            else:
                assert len(back.geoms) == len(g.geoms)
                for a, b in zip(back.geoms, g.geoms):
                    np.testing.assert_allclose(a.coords, b.coords)
