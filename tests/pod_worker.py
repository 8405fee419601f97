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
    # optional 6th arg: checkpoint dir -> exercises the chunk-manifest
    # elastic-recovery path under a real multi-process gather
    checkpoint_dir = sys.argv[6] if len(sys.argv) > 6 else None

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

    paths = sorted(glob.glob(corpus_dir + "/*.jpeg"))
    dl = gf.GeoFrame(
        {"d": list(range(4))},
        geometry=[_poly.box(1200 * i, 0, 1200 * (i + 1), 1200) for i in range(4)],
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
    )
    print(f"WORKER {pid} OK tiles={stats.tiles} dets={len(det)}", flush=True)


if __name__ == "__main__":
    main()
