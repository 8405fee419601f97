"""Decode-at-scale: host decodes rasters at img/tile scale (JPEG in the
DCT domain via libjpeg scale_num/denom; the Python loader's bilinear twin)
and ships img-size tiles, with TileSpec offsets still in source pixels.

Round-4 host-feed lever (VERDICT #4): the model eats 640px from 1024px
JPEG tiles; full decode spends ~60% of its IDCT on pixels the resize
throws away (reference staged full-size JPEGs: src/load_data/tile_tifs.py:50-74).
"""

import numpy as np
import pytest
from PIL import Image

from aquaculture_tpu.data import native_loader
from aquaculture_tpu.data.loader import tile_batches

needs_native = pytest.mark.skipif(
    not native_loader.supports_scaled(),
    reason="libaquatile.so with decode-at-scale not built",
)


def _write_jpeg(path, px, seed=0, quality=92):
    rng = np.random.default_rng(seed)
    # smooth content so DCT-scaled and bilinear-resized pixels stay close
    base = rng.integers(0, 255, (px // 64, px // 64, 3), dtype=np.uint8)
    arr = np.asarray(
        Image.fromarray(base).resize((px, px), Image.BILINEAR), np.uint8
    )
    Image.fromarray(arr).save(path, quality=quality)
    return arr


@needs_native
def test_native_scaled_decode_shape_and_pixels(tmp_path):
    p = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    full = _write_jpeg(p, 1024)
    out = native_loader.decode_image_scaled(str(p), 640)
    assert out is not None and out.shape == (640, 640, 3)
    ref = np.asarray(Image.fromarray(full).resize((640, 640), Image.BILINEAR), np.int16)
    diff = np.abs(out.astype(np.int16) - ref)
    # DCT-domain 5/8 vs bilinear: different filters, same image — close on
    # smooth content
    assert float(diff.mean()) < 6.0


@needs_native
def test_native_loader_out_tile_offsets_source_space(tmp_path):
    # one pre-tiled 1024 file + one 2048 raster
    p1 = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_512_512.jpeg"
    p2 = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2015_1_0_0.jpeg"
    _write_jpeg(p1, 1024, seed=1)
    _write_jpeg(p2, 2048, seed=2)
    batches = list(native_loader.native_tile_batches(
        [str(p1), str(p2)], batch_size=8, tile=1024, out_tile=640, n_threads=1,
    ))
    tiles = [(s, b.images[i]) for b in batches for i, s in enumerate(b.specs) if s is not None]
    assert len(tiles) == 1 + 4  # pre-tiled + 2x2 grid of the 2048 raster
    for s, img in tiles:
        assert img.shape == (640, 640, 3)
    offs = sorted((s.year, s.x_offset, s.y_offset) for s, _ in tiles)
    assert offs == [
        (2014, 512, 512),
        (2015, 0, 0), (2015, 0, 1024), (2015, 1024, 0), (2015, 1024, 1024),
    ]


@needs_native
def test_python_loader_out_tile_matches_native_shapes(tmp_path):
    p = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    _write_jpeg(p, 2048, seed=3)
    nat = [
        (s, b.images[i])
        for b in native_loader.native_tile_batches([str(p)], 8, tile=1024, out_tile=640, n_threads=1)
        for i, s in enumerate(b.specs) if s is not None
    ]
    py = [
        (s, b.images[i])
        for b in tile_batches([str(p)], 8, tile=1024, out_tile=640)
        for i, s in enumerate(b.specs) if s is not None
    ]
    assert sorted((s.x_offset, s.y_offset) for s, _ in nat) == \
           sorted((s.x_offset, s.y_offset) for s, _ in py)
    nat_by = {(s.x_offset, s.y_offset): img for s, img in nat}
    for s, img in py:
        other = nat_by[(s.x_offset, s.y_offset)]
        assert img.shape == other.shape == (640, 640, 3)
        # same content through two downscale filters
        d = np.abs(img.astype(np.int16) - other.astype(np.int16))
        assert float(d.mean()) < 6.0


@needs_native
def test_native_scaled_mixed_corpus_routes_tiff_to_pil_twin(tmp_path):
    """Round-4 review regression: in scaled mode only two pixel operators
    are mAP-gated (JPEG DCT decode, PIL resize). A TIFF in a scaled
    native-loader corpus must come out pixel-IDENTICAL to the Python
    loader's PIL twin — not through the ungated C++ 2-tap bilinear."""
    pj = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    pt = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2015_1_0_0.tif"
    _write_jpeg(pj, 1024, seed=6)
    rng = np.random.default_rng(7)
    # high-frequency content: 2-tap bilinear and PIL's area-weighted
    # filter disagree strongly here, so identity is a sharp test
    arr = rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)
    Image.fromarray(arr).save(pt)
    nat = [
        (s, b.images[i])
        for b in native_loader.native_tile_batches(
            [str(pj), str(pt)], 8, tile=1024, out_tile=640, n_threads=1)
        for i, s in enumerate(b.specs) if s is not None
    ]
    assert sorted(s.year for s, _ in nat) == [2014, 2015]
    tiff_img = next(img for s, img in nat if s.year == 2015)
    py = [
        (s, b.images[i])
        for b in tile_batches([str(pt)], 8, tile=1024, out_tile=640)
        for i, s in enumerate(b.specs) if s is not None
    ]
    assert len(py) == 1
    np.testing.assert_array_equal(tiff_img, py[0][1])
    jpeg_img = next(img for s, img in nat if s.year == 2014)
    assert jpeg_img.shape == (640, 640, 3)


def test_python_loader_out_tile_rejects_overlap(tmp_path):
    p = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    _write_jpeg(p, 2048, seed=4)
    with pytest.raises(ValueError, match="overlap"):
        list(tile_batches([str(p)], 8, tile=1024, stride=512, out_tile=640))


def test_detect_files_decode_scale_end_to_end(tmp_path):
    """decode_scale=True produces detections in SOURCE pixel space whose
    geometry matches the full-decode run closely (same tiles, ~same pixels
    after the two resize paths)."""
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.pipeline import detect_files

    p = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    _write_jpeg(p, 512, seed=5)
    model, params = yolov5_init("n", num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig(img_size=160, conf_threshold=1e-5)
    # 8*160 % 512 == 0 (scale 2.5/8 -> N/8 check: 1280/512 = 2.5 not integer)
    with pytest.raises(ValueError, match="N/8"):
        detect_files([str(p)], model, params, cfg, 4, tile=512, decode_scale=True)

    # random-init confidences at img 128 sit below 1e-4 (detect-bias init);
    # 1e-5 yields ~95 survivors on this seed
    cfg = DetectConfig(img_size=128, conf_threshold=1e-5)  # 8*128/512 = 2
    b0, c0, k0, s0, st0 = detect_files(
        [str(p)], model, params, cfg, 4, tile=512, decode_scale=False,
        use_native=False,
    )
    b1, c1, k1, s1, st1 = detect_files(
        [str(p)], model, params, cfg, 4, tile=512, decode_scale=True,
        use_native=False,
    )
    assert st0.tiles == st1.tiles == 1
    assert len(b0) > 0 and len(b1) > 0
    # both runs report in SOURCE-tile pixel space (untrained boxes are
    # unclipped, so compare the coordinate SCALE, not hard bounds: a
    # missing 128->512 rescale would shrink the scaled run's extent 4x)
    ext0 = np.ptp(np.asarray(b0)) or 1.0
    ext1 = np.ptp(np.asarray(b1)) or 1.0
    assert 0.5 < ext1 / ext0 < 2.0, (ext0, ext1)
    # the two decode paths see near-identical images -> near-identical
    # detection geometry: every scaled-run box has a close full-run twin
    def nearest_gap(a, bs):
        return min(np.abs(np.asarray(b) - np.asarray(a)).max() for b in bs)

    close = sum(1 for b in b1 if nearest_gap(b, b0) <= 8)
    assert close / len(b1) > 0.7

    with pytest.raises(ValueError, match="incompatible"):
        detect_files([str(p)], model, params, cfg, 4, tile=512,
                     decode_scale=True, stride=256)


@needs_native
def test_scaled_mode_routes_mislabeled_tiff_by_content(tmp_path):
    """TIFF content behind a .jpeg name: the C++ decoder dispatches on magic
    bytes and would whole-image-bilinear it (an operator no mAP gate covers);
    the scaled-mode router must sniff content and hand the file to the
    Python twin — whose output it must match pixel-for-pixel."""
    p = tmp_path / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg"
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)
    Image.fromarray(arr).save(p, format="TIFF")

    nat = list(native_loader.native_tile_batches(
        [str(p)], batch_size=4, tile=1024, out_tile=640, n_threads=1,
    ))
    py = list(tile_batches([str(p)], batch_size=4, tile=1024, out_tile=640))
    na = [b.images[i] for b in nat for i, s in enumerate(b.specs) if s is not None]
    pa = [b.images[i] for b in py for i, s in enumerate(b.specs) if s is not None]
    assert len(na) == len(pa) == 1
    assert np.array_equal(na[0], pa[0])


@needs_native
def test_scaled_decode_grow_retry_on_small_cap(tmp_path):
    """decode_image_scaled retries with the exact size when the first call
    returns -2 (buffer too small) — the same contract as decode_image."""
    p = tmp_path / "big.jpeg"
    _write_jpeg(p, 1024, seed=4)
    # max_side=256 caps the first buffer below the 640x640x3 output
    out = native_loader.decode_image_scaled(str(p), 640, max_side=256)
    assert out is not None and out.shape == (640, 640, 3)
