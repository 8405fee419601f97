"""Pod-scale runner tests: corpus sharding, single-host gather identity,
end-to-end single-process pod pipeline."""

import numpy as np
import pytest

from aquaculture_tpu.parallel.pod import gather_detection_tables, shard_corpus


def test_shard_corpus_balanced_disjoint():
    paths = [f"p{i}" for i in range(10)]
    shards = [shard_corpus(paths, 3, h) for h in range(3)]
    assert [len(s) for s in shards] == [4, 3, 3]
    flat = [p for s in shards for p in s]
    assert flat == paths  # contiguous, complete, ordered


def test_shard_corpus_more_hosts_than_files():
    paths = ["a", "b"]
    shards = [shard_corpus(paths, 4, h) for h in range(4)]
    assert [len(s) for s in shards] == [1, 1, 0, 0]


def test_gather_single_process_identity():
    b = np.arange(8).reshape(2, 4).astype(np.float64)
    c = np.asarray([0.5, 0.6])
    k = np.asarray([0, 1])
    t = np.asarray([10, 11])
    gb, gc, gk, gt = gather_detection_tables(b, c, k, t)
    np.testing.assert_array_equal(gb, b)
    np.testing.assert_array_equal(gt, t)


def test_run_pod_pipeline_single_host(tmp_path):
    from PIL import Image

    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.geo import polygon as _poly
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.parallel.pod import run_pod_pipeline

    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg"
        Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    dl = gf.GeoFrame(
        {"d": [0, 1]},
        geometry=[_poly.box(0, 0, 1200, 1200), _poly.box(1200, 0, 2400, 1200)],
        crs=3857,
    )
    model, params = yolov5_init("n", num_classes=5, seed=0)
    params = model.fuse(params)
    det, stats = run_pod_pipeline(
        paths,
        model,
        params,
        dl,
        cfg=DetectConfig(conf_threshold=1e-5),
        batch_size=2,
        out_path=str(tmp_path / "global.geojson"),
    )
    assert stats.tiles == 2
    assert len(det) > 0
    assert (tmp_path / "global.geojson").exists()
    assert det.crs == 4326
