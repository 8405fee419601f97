"""Worker process for the 2-process pod-pipeline test (see test_pod.py).

Each worker joins a jax.distributed cluster over localhost, claims its
corpus shard, runs the full detect pipeline, and participates in the DCN
detection all-gather (parallel/pod.py:74-155 — the branches only a real
process_count>1 run can execute). Host 0 writes the merged GeoJSON.
"""

import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    corpus_dir = sys.argv[4]
    out_path = sys.argv[5]
    # optional trailing args: a checkpoint dir (chunk-manifest elastic
    # recovery under a real multi-process gather) and/or "overlap=N"
    # (strided tiles + cross-tile NMS after the global gather)
    checkpoint_dir = None
    overlap = 0
    for extra in sys.argv[6:]:
        if extra.startswith("overlap="):
            overlap = int(extra[len("overlap="):])
        else:
            checkpoint_dir = extra

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    import glob

    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.geo import polygon as _poly
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.parallel.pod import run_pod_pipeline

    store = None
    if corpus_dir.startswith("mem:"):
        # Fake-store streaming mode: the corpus exists ONLY inside a
        # MemoryBlobStore rendered deterministically from the seed — zero
        # local image files anywhere; every byte reaches the pipeline
        # through BlobStore.get (the reference's GCS transport,
        # utils.py:192-238).
        seed = int(corpus_dir[len("mem:"):])
        store = _render_mem_store(seed)
        paths = store.list("corpus/")
        assert store.get_count == 0
    else:
        paths = sorted(glob.glob(corpus_dir + "/*.jpeg"))
    # one download box per corpus tile (bbox_ind i must resolve) — sized
    # from the corpus so uneven shards (e.g. 6 tiles / 4 hosts) geocode
    n_boxes = max(4, len(paths))
    dl = gf.GeoFrame(
        {"d": list(range(n_boxes))},
        geometry=[_poly.box(1200 * i, 0, 1200 * (i + 1), 1200) for i in range(n_boxes)],
        crs=3857,
    )
    model, params = yolov5_init("n", num_classes=5, seed=0)
    params = model.fuse(params)
    det, stats = run_pod_pipeline(
        paths,
        model,
        params,
        dl,
        cfg=DetectConfig(img_size=320, conf_threshold=1e-5),
        batch_size=2,
        out_path=out_path,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=1,
        store=store,
        overlap=overlap,
    )
    streamed = store.get_count if store is not None else -1
    print(
        f"WORKER {pid} OK tiles={stats.tiles} dets={len(det)} streamed={streamed}",
        flush=True,
    )


def _render_mem_store(seed: int):
    import io

    import numpy as np
    from PIL import Image

    from aquaculture_tpu.data.store import MemoryBlobStore

    rng = np.random.default_rng(seed)
    store = MemoryBlobStore()
    for i in range(4):
        arr = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")  # lossless -> determinism
        store.put(f"corpus/ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.png", buf.getvalue())
    return store


if __name__ == "__main__":
    main()
