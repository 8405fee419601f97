"""Input-pipeline tests: filename codec, tiling, blank detection, GeoTIFF IO,
batched loader."""

import numpy as np
import pytest

from aquaculture_tpu.data.blank import blank_fraction, is_blank, is_partly_blank
from aquaculture_tpu.data.filenames import TileSpec, decode_tile_name, encode_tile_name
from aquaculture_tpu.data.geotiff import read_geotiff, write_geotiff
from aquaculture_tpu.data.loader import batch_tiles, prefetch, tile_batches
from aquaculture_tpu.data.tiling import split_image, tile_offsets


def test_filename_roundtrip():
    spec = TileSpec(year=2014, bbox_ind=123, x_offset=2048, y_offset=1024)
    name = encode_tile_name(spec)
    assert name == "ORTHOIMAGERY.ORTHOPHOTOS2014_123_2048_1024.jpeg"
    back = decode_tile_name(name)
    assert (back.year, back.bbox_ind, back.x_offset, back.y_offset) == (2014, 123, 2048, 1024)


def test_filename_2021_ortho_express():
    spec = TileSpec(year=2021, bbox_ind=7, x_offset=0, y_offset=5120)
    name = encode_tile_name(spec)
    assert name == "ORTHOIMAGERY.ORTHOPHOTOS.ORTHO-EXPRESS.2021_7_0_5120.jpeg"
    back = decode_tile_name(name)
    assert back.year == 2021 and back.bbox_ind == 7


def test_filename_txt_labels():
    back = decode_tile_name("/some/dir/ORTHOIMAGERY.ORTHOPHOTOS2005_42_3072_0.txt")
    assert (back.year, back.bbox_ind, back.x_offset, back.y_offset) == (2005, 42, 3072, 0)


def test_tile_offsets_grid():
    offs = tile_offsets(6144, 1024)
    assert len(offs) == 36
    assert offs[0] == (0, 0)
    assert offs[1] == (0, 1024)  # x-major: second entry advances y
    assert offs[6] == (1024, 0)


def test_split_image_content():
    img = np.zeros((2048, 2048, 3), np.uint8)
    img[0:1024, 1024:2048] = 7  # tile at x_offset=1024, y_offset=0
    tiles, offs = split_image(img, 1024)
    assert tiles.shape == (4, 1024, 1024, 3)
    i = offs.index((1024, 0))
    assert (tiles[i] == 7).all()
    for j, off in enumerate(offs):
        if j != i:
            assert (tiles[j] == 0).all()


def test_split_matches_direct_slicing():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (3072, 3072, 3), dtype=np.uint8)
    tiles, offs = split_image(img, 1024)
    for t, (x, y) in zip(tiles, offs):
        np.testing.assert_array_equal(t, img[y : y + 1024, x : x + 1024])


def test_is_blank_rules():
    assert is_blank(np.zeros((8, 8, 3), np.uint8))
    assert is_blank(np.full((8, 8, 3), 255, np.uint8))
    assert is_blank(np.full((8, 8, 3), 252, np.uint8))  # near-white band
    assert is_blank(np.ones((8, 8, 3), np.uint8))
    img = np.full((8, 8, 3), 128, np.uint8)
    assert not is_blank(img)
    img[0, 0] = 255  # extrema (128, 255) -> not blank
    assert not is_blank(img)


def test_is_partly_blank():
    img = np.full((16, 16, 3), 100, np.uint8)
    assert not is_partly_blank(img)
    img[3, :, :] = 255  # one full white row
    assert is_partly_blank(img)


def test_blank_fraction():
    img = np.full((10, 10, 3), 100, np.uint8)
    img[:5] = 255
    assert blank_fraction(img) == pytest.approx(0.5)


def test_geotiff_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    bounds = (100000.0, 5000000.0, 101200.0, 5001200.0)
    path = str(tmp_path / "t.tif")
    write_geotiff(path, arr, bounds, epsg=3857)
    gt = read_geotiff(path)
    np.testing.assert_array_equal(gt.array, arr)
    assert gt.epsg == 3857
    assert gt.bounds == pytest.approx(bounds)
    # pixel box mapping: full image -> bounds
    assert gt.pixel_box_to_crs(0, 0, 64, 64) == pytest.approx(bounds)


def test_batch_tiles_padding():
    tiles = [(np.full((1024, 1024, 3), i, np.uint8), TileSpec(2014, 0, 0, i)) for i in range(5)]
    batches = list(batch_tiles(iter(tiles), batch_size=4))
    assert len(batches) == 2
    assert batches[0].valid.all()
    assert batches[1].valid.tolist() == [True, False, False, False]
    assert batches[1].specs[1] is None
    assert (batches[1].images[1] == 0).all()


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_tile_batches_end_to_end(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    # one pre-tiled 1024 file + one 2048 raster that splits into 4
    p1 = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2010_1_0_0.jpeg"
    Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)).save(p1)
    p2 = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2012_2_0_0.png"
    Image.fromarray(rng.integers(0, 255, (2048, 2048, 3), dtype=np.uint8)).save(p2)

    batches = list(tile_batches([str(p1), str(p2)], batch_size=3))
    n_tiles = sum(int(b.valid.sum()) for b in batches)
    assert n_tiles == 5
    specs = [s for b in batches for s, v in zip(b.specs, b.valid) if v]
    assert {(s.year, s.bbox_ind) for s in specs} == {(2010, 1), (2012, 2)}
    # split tiles carry accumulated offsets
    offs = sorted((s.x_offset, s.y_offset) for s in specs if s.year == 2012)
    assert offs == [(0, 0), (0, 1024), (1024, 0), (1024, 1024)]


def test_iter_tiles_decode_threads_order(tmp_path):
    # Threaded decode-ahead must yield tiles in exactly sequential order
    # with identical pixels, and decode_threads=1 must opt out of the pool.
    from PIL import Image

    from aquaculture_tpu.data.loader import iter_tiles_from_files

    rng = np.random.default_rng(3)
    paths = []
    for i in range(5):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        p = tmp_path / f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    seq = list(iter_tiles_from_files(paths, tile=64, decode_threads=1))
    par = list(iter_tiles_from_files(paths, tile=64, decode_threads=4))
    assert len(seq) == len(par) == 5
    for (a, sa), (b, sb) in zip(seq, par):
        assert sa == sb
        assert np.array_equal(a, b)
