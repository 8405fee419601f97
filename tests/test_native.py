"""Native C++ tile-loader tests (built on demand via make)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native_lib():
    so = REPO / "native" / "libaquatile.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(REPO / "native")], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("native toolchain unavailable")
    from aquaculture_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("libaquatile.so failed to load")
    return native_loader


def test_native_decode_matches_pil(native_lib, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (512, 768, 3), dtype=np.uint8)
    p_tif = tmp_path / "a.tif"
    Image.fromarray(arr).save(p_tif)
    out = native_lib.decode_image(str(p_tif))
    np.testing.assert_array_equal(out, arr)  # TIFF is lossless

    p_jpg = tmp_path / "a.jpg"
    Image.fromarray(arr).save(p_jpg, quality=95)
    out_j = native_lib.decode_image(str(p_jpg))
    pil_j = np.asarray(Image.open(p_jpg).convert("RGB"))
    assert out_j.shape == pil_j.shape
    # same JPEG bitstream, same libjpeg underneath: pixel-identical or close
    assert np.mean(np.abs(out_j.astype(int) - pil_j.astype(int))) < 1.0


def test_native_tile_batches_match_python_loader(native_lib, tmp_path):
    from PIL import Image

    from aquaculture_tpu.data.loader import tile_batches

    rng = np.random.default_rng(1)
    paths = []
    for i, size in enumerate((2048, 1024)):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = tmp_path / f"ORTHOIMAGERY.ORTHOPHOTOS201{i}_{i}_0_0.tif"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    def collect(batches):
        out = {}
        for b in batches:
            for img, spec, v in zip(b.images, b.specs, b.valid):
                if v:
                    out[(spec.year, spec.bbox_ind, spec.x_offset, spec.y_offset)] = img.copy()
        return out

    nat = collect(native_lib.native_tile_batches(paths, batch_size=3, tile=1024))
    py = collect(tile_batches(paths, batch_size=3, tile=1024))
    assert set(nat) == set(py)
    for k in py:
        np.testing.assert_array_equal(nat[k], py[k])


def test_native_loader_early_destroy_no_hang(native_lib, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, (2048, 2048, 3), dtype=np.uint8)
        p = tmp_path / f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.tif"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    it = native_lib.native_tile_batches(paths, batch_size=2, tile=1024, queue_depth=2)
    next(it)
    it.close()  # generator close -> aq_loader_destroy; must not deadlock
