"""Acquisition-layer tests: WMS loop with fake transport, asc merge,
shapefile roundtrip, linemerge/polygonize, land filter, image boxes."""

import io

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.acquire.bathymetry import merge_asc_grids, read_asc
from aquaculture_tpu.acquire.landfilter import build_land_filter
from aquaculture_tpu.acquire.wms import (
    LocalBlobStore,
    download_images_within_shape,
    layer_name,
    tile_shapefile,
)
from aquaculture_tpu.data.imageboxes import (
    LocalImageStore,
    build_image_boxes,
    classify_blank_status,
    correct_partly_blank_geom,
    image_box_for_spec,
    remove_white_image_boxes,
)
from aquaculture_tpu.data.filenames import TileSpec
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.geo.lines import linemerge, polygonize
from aquaculture_tpu.geo.shapefile import read_shapefile, write_shapefile


# ------------------------------------------------------------------ wms


class FakeTransport:
    """Blank below y=0, imagery above. Records calls."""

    def __init__(self):
        self.calls = []

    def getmap(self, layer, bbox, size):
        self.calls.append((layer, bbox, size))
        from PIL import Image

        blank = bbox[1] < 0
        v = 255 if blank else 120
        img = Image.fromarray(np.full((8, 8, 3), v, np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="TIFF")
        return buf.getvalue()


def test_layer_names():
    assert layer_name(2014) == "ORTHOIMAGERY.ORTHOPHOTOS2014"
    assert layer_name(2021) == "ORTHOIMAGERY.ORTHOPHOTOS.ORTHO-EXPRESS.2021"


def test_tile_shapefile_covers_shape():
    shape = _poly.box(0, 0, 2500, 1100)
    boxes = tile_shapefile([shape], size=1200.0)
    # grid from 0 to bounds+size: x in {0,1200,2400,3600?}: arange(0, 2500+1200, 1200)
    # -> 0,1200,2400,3600; 3600 box [3600,4800] doesn't intersect.
    xs = sorted({b.bounds[0] for b in boxes})
    assert xs == [0.0, 1200.0, 2400.0]
    assert all(_poly.intersects(shape, b) for b in boxes)


def test_download_loop_blank_skip_and_resume(tmp_path):
    # open interval avoids boundary-touch tiles: two boxes, y<0 blank
    coast = [_poly.box(1, -1199, 1199, 1199)]
    t = FakeTransport()
    store = LocalBlobStore(str(tmp_path))
    frame = download_images_within_shape(coast, [2014], t, store, box_size=1200.0)
    assert len(frame) == 2
    # only the non-blank box got a full-size download
    full_calls = [c for c in t.calls if c[2] == 6144]
    assert len(full_calls) == 1
    stored = [f"coastal_french_data/tifs/ORTHOIMAGERY.ORTHOPHOTOS2014_{i}.tif" for i in range(2)]
    assert sum(store.exists(p) for p in stored) == 1
    # resume: second run does nothing new for the stored blob
    n_calls = len(t.calls)
    download_images_within_shape(coast, [2014], t, store, box_size=1200.0)
    probes = [c for c in t.calls[n_calls:] if c[2] == 6144]
    assert len(probes) == 0


# ------------------------------------------------------------------ asc


ASC = """ncols 4
nrows 3
xllcorner 10.0
yllcorner 40.0
cellsize 0.5
NODATA_value -9999
1 2 3 4
5 6 7 8
-9999 10 11 12
"""


def test_read_asc():
    g = read_asc(ASC)
    assert g.array.shape == (3, 4)
    assert g.bounds == (10.0, 40.0, 12.0, 41.5)
    assert np.isnan(g.array[2, 0])
    assert g.array[0, 0] == 1


def test_merge_asc_first_wins():
    g1 = read_asc(ASC)
    asc2 = ASC.replace("xllcorner 10.0", "xllcorner 12.0")
    g2 = read_asc(asc2)
    m = merge_asc_grids([g1, g2])
    assert m.bounds == (10.0, 40.0, 14.0, 41.5)
    assert m.array.shape == (3, 8)
    assert m.array[0, 0] == 1 and m.array[0, 4] == 1  # second grid starts at col 4


# ------------------------------------------------------------------ shapefile


def test_shapefile_polygon_roundtrip(tmp_path):
    geoms = [
        _poly.box(0, 0, 10, 10),
        _poly.Polygon(
            [(20, 0), (30, 0), (30, 10), (20, 10)],
            holes=[[(22, 2), (28, 2), (28, 8), (22, 8)]],
        ),
    ]
    frame = gf.GeoFrame({"name": ["a", "b"], "val": [1.5, 2.5]}, geometry=geoms, crs=4326)
    path = str(tmp_path / "test.shp")
    write_shapefile(path, frame)
    back = read_shapefile(path, crs=4326)
    assert len(back) == 2
    assert back["name"].tolist() == ["a", "b"]
    assert back["val"].tolist() == pytest.approx([1.5, 2.5])
    assert back["geometry"].iloc[0].bounds == pytest.approx((0, 0, 10, 10))
    g1 = back["geometry"].iloc[1]
    assert g1.area == pytest.approx(100 - 36)  # hole preserved
    assert back.crs == 4326


def test_shapefile_points_roundtrip(tmp_path):
    frame = gf.GeoFrame(
        {"id": [1, 2]},
        geometry=[_poly.Point(1.5, 2.5), _poly.Point(-3.0, 4.0)],
        crs=4326,
    )
    path = str(tmp_path / "pts.shp")
    write_shapefile(path, frame)
    back = read_shapefile(path)
    assert [(g.x, g.y) for g in back["geometry"]] == [(1.5, 2.5), (-3.0, 4.0)]


# ------------------------------------------------------------------ lines


def test_linemerge_chains_segments():
    segs = [
        [(0, 0), (1, 0)],
        [(1, 0), (1, 1)],
        [(1, 1), (0, 1)],
        [(5, 5), (6, 6)],  # disconnected
    ]
    merged = linemerge(segs)
    lens = sorted(len(m.coords) for m in merged)
    assert lens == [2, 4]


def test_polygonize_closed_ring():
    segs = [
        [(0, 0), (1, 0)],
        [(1, 0), (1, 1)],
        [(1, 1), (0, 1)],
        [(0, 1), (0, 0)],
        [(9, 9), (10, 10)],  # open chain: no polygon
    ]
    polys = polygonize(segs)
    assert len(polys) == 1
    assert polys[0].area == pytest.approx(1.0)


# ------------------------------------------------------------------ land filter


def test_build_land_filter():
    # two closed coastline loops: big mainland + small island, and one EEZ
    mainland_ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    island_ring = [(12, 2), (14, 2), (14, 4), (12, 4), (12, 2)]
    country = _poly.box(-1, -1, 15, 11)
    out = build_land_filter(
        [mainland_ring, island_ring], country, eez=None, keep_faces=(0,), crs=3857
    )
    kinds = out["kind"].tolist()
    assert kinds == ["primary", "island"]
    assert out["geometry"].iloc[0].area == pytest.approx(100.0)
    assert out["geometry"].iloc[1].area == pytest.approx(4.0)


# ------------------------------------------------------------------ image boxes


def test_image_box_for_spec():
    spec = TileSpec(year=2014, bbox_ind=0, x_offset=1024, y_offset=0)
    b = image_box_for_spec(spec, (0.0, 0.0, 1200.0, 1200.0))
    minx, miny, maxx, maxy = b.bounds
    assert minx == pytest.approx(1024 / 6144 * 1200)
    assert maxx == pytest.approx(2048 / 6144 * 1200)
    assert maxy == pytest.approx(1200.0)  # y_offset 0 -> top of box
    assert miny == pytest.approx(1200 - 1024 / 6144 * 1200)


def test_build_image_boxes_and_blank_screen(tmp_path):
    from PIL import Image

    dl = gf.GeoFrame({"d": [0]}, geometry=[_poly.box(0, 0, 1200, 1200)], crs=3857)
    files = [
        "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg",       # complete
        "ORTHOIMAGERY.ORTHOPHOTOS2014_0_1024_0.jpeg",    # blank
        "ORTHOIMAGERY.ORTHOPHOTOS2014_0_2048_0.jpeg",    # partly blank
    ]
    imgs = [
        np.full((64, 64, 3), 100, np.uint8),
        np.full((64, 64, 3), 255, np.uint8),
        np.full((64, 64, 3), 100, np.uint8),
    ]
    imgs[2][:, 32:] = 255  # right half white
    for f, im in zip(files, imgs):
        Image.fromarray(im).save(tmp_path / f)

    boxes = build_image_boxes(files, dl)
    assert len(boxes) == 3
    store = LocalImageStore(str(tmp_path))
    assert classify_blank_status(store.get(files[0])) == "complete"
    assert classify_blank_status(store.get(files[1])) == "blank"
    assert classify_blank_status(store.get(files[2])) == "partly blank"

    clean = remove_white_image_boxes(boxes, store)
    assert len(clean) == 2  # blank dropped
    # partly blank geometry shrank to ~left half
    pb = clean[clean["image_file"] == files[2]]
    g = pb["geometry"].iloc[0]
    full = boxes[boxes["image_file"] == files[2]]["geometry"].iloc[0]
    assert g.area < 0.6 * full.area
    assert g.area > 0.3 * full.area


def test_correct_partly_blank_geom_all_blank_is_empty():
    img = np.full((32, 32, 3), 255, np.uint8)
    g = correct_partly_blank_geom(img, _poly.box(0, 0, 100, 100))
    assert g.is_empty


def test_load_shapefiles_offline(tmp_path):
    from aquaculture_tpu.acquire.shapefiles import load_shapefiles
    from aquaculture_tpu.geo.shapefile import read_shapefile, write_shapefile

    # fake transport: serve a zip containing a tiny real shapefile
    frame = gf.GeoFrame({"id": [1]}, geometry=[_poly.box(0, 0, 1, 1)], crs=4326)
    shp_dir = tmp_path / "src"
    shp_dir.mkdir()
    write_shapefile(str(shp_dir / "coast.shp"), frame)
    import zipfile as zf

    buf = io.BytesIO()
    with zf.ZipFile(buf, "w") as z:
        for f in shp_dir.iterdir():
            z.write(f, f.name)
    payload = buf.getvalue()

    calls = []

    def fetch(url):
        calls.append(url)
        return payload

    out = load_shapefiles(str(tmp_path / "shapes"), fetch=fetch)
    assert set(out) == {"europe_coastline", "france_grid"}
    back = read_shapefile(out["europe_coastline"] + "/coast.shp")
    assert len(back) == 1
    # resumable: second call fetches nothing
    n = len(calls)
    load_shapefiles(str(tmp_path / "shapes"), fetch=fetch)
    assert len(calls) == n


def test_build_land_filter_with_nonrectilinear_eez():
    # a triangular (non-rectilinear) EEZ carving the sea off the mainland
    mainland_ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    sea_ring = [(20, 0), (26, 0), (26, 6), (20, 6), (20, 0)]  # a sea face
    country = _poly.box(-1, -1, 30, 11)
    eez = _poly.Polygon([(18, -1), (30, -1), (30, 11), (18, 11)])  # covers the sea face
    out = build_land_filter(
        [mainland_ring, sea_ring], country, eez=eez, keep_faces=(0,), crs=3857
    )
    # the sea face is fully inside the EEZ -> excluded entirely
    assert out["kind"].tolist() == ["primary"]
    assert out["geometry"].iloc[0].area == pytest.approx(100.0)


def test_shapefile_read_by_sibling_extension(tmp_path):
    """read_shapefile accepts any member of the sidecar set (.dbf/.shx/.prj),
    not just the .shp — aq-acquire routes *.dbf paths here."""
    frame = gf.GeoFrame(
        {"id": [1]}, geometry=[_poly.box(0, 0, 5, 5)], crs=4326
    )
    write_shapefile(str(tmp_path / "t.shp"), frame)
    for sib in ("t.dbf", "t.shp", "t"):
        back = read_shapefile(str(tmp_path / sib))
        assert len(back) == 1
        assert back["geometry"].iloc[0].bounds == pytest.approx((0, 0, 5, 5))
