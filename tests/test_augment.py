"""Augmentation + training-dataset tests."""

import numpy as np
import pytest

from aquaculture_tpu.config import TrainConfig
from aquaculture_tpu.train.augment import flip_augment, hsv_augment, mosaic4, random_affine
from aquaculture_tpu.train.dataset import DetectionDataset, load_sample


def _img_with_box(size=128, lo=40, hi=80, value=200):
    img = np.zeros((size, size, 3), np.uint8)
    img[lo:hi, lo:hi] = value
    boxes = np.asarray([[0.0, (lo + hi) / 2, (lo + hi) / 2, hi - lo, hi - lo]])
    return img, boxes


def test_fliplr_moves_box():
    img, boxes = _img_with_box()
    rng = np.random.default_rng(0)
    out, b = flip_augment(img, boxes, rng, fliplr=1.0, flipud=0.0)
    assert b[0, 1] == pytest.approx(128 - 60)
    assert b[0, 2] == pytest.approx(60)
    # pixel content flipped
    np.testing.assert_array_equal(out[:, ::-1], img)


def test_hsv_preserves_shape_and_dtype():
    img, _ = _img_with_box()
    out = hsv_augment(img, np.random.default_rng(0))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mosaic4_merges_boxes():
    imgs, boxes = zip(*[_img_with_box() for _ in range(4)])
    rng = np.random.default_rng(1)
    canvas, merged = mosaic4(list(imgs), list(boxes), size=128, rng=rng)
    assert canvas.shape == (256, 256, 3)
    assert len(merged) <= 4  # some may fall off-canvas
    assert len(merged) >= 1


def test_random_affine_clips_and_drops():
    img, boxes = _img_with_box()
    rng = np.random.default_rng(2)
    out, b = random_affine(img, boxes, size=128, rng=rng, scale=0.0, translate=0.0)
    assert out.shape == (128, 128, 3)
    # no scale/translate=0.5 center: box preserved
    assert len(b) == 1
    assert b[0, 3] == pytest.approx(40, abs=1)


def test_dataset_fixed_shapes(tmp_path):
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)).save(
            tmp_path / "images" / f"x{i}.jpg"
        )
        (tmp_path / "labels" / f"x{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    cfg = TrainConfig(img_size=64, batch_size=2, max_boxes_per_image=10)
    ds = DetectionDataset(str(tmp_path / "images"), str(tmp_path / "labels"), cfg, augment=True, seed=0)
    batches = list(ds.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["labels"].shape == (2, 10, 5)
    assert b["label_mask"].shape == (2, 10)
    assert 0.0 <= b["images"].min() and b["images"].max() <= 1.0


def test_load_sample_pixel_boxes(tmp_path):
    from PIL import Image

    Image.fromarray(np.zeros((200, 100, 3), np.uint8)).save(tmp_path / "a.jpg")
    (tmp_path / "a.txt").write_text("1 0.5 0.5 0.1 0.2\n")
    img, boxes = load_sample(str(tmp_path / "a.jpg"), str(tmp_path / "a.txt"))
    assert img.shape == (200, 100, 3)
    # normalized -> pixels of (w=100, h=200)
    assert boxes[0].tolist() == [1.0, 50.0, 100.0, 10.0, 40.0]


def test_dataset_feed_threads_deterministic(tmp_path):
    """Batches must be IDENTICAL for any feed_threads count (per-sample
    deterministic seeding), so threading the host feed can never change a
    training run."""
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)).save(
            tmp_path / "images" / f"x{i}.jpg"
        )
        (tmp_path / "labels" / f"x{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")

    def run(threads):
        cfg = TrainConfig(
            img_size=64, batch_size=3, max_boxes_per_image=8, feed_threads=threads
        )
        ds = DetectionDataset(
            str(tmp_path / "images"), str(tmp_path / "labels"), cfg,
            augment=True, seed=3,
        )
        return list(ds.epoch(0)) + list(ds.epoch(1))

    seq = run(1)
    par = run(4)
    assert len(seq) == len(par) > 0
    for a, b in zip(seq, par):
        for k in ("images", "labels", "label_mask"):
            np.testing.assert_array_equal(a[k], b[k])
