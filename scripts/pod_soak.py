"""Corpus-scale soak of the pod pipeline (VERDICT r4 #7).

The reference's scale story is a 2.83 TB tile corpus (reference
README.md:63); the repo's exercised corpora were test-sized. This
harness streams a SYNTHETIC 50-100k-tile corpus through
``run_pod_pipeline`` on CPU and checks the properties that only show up
at scale:

* bounded RSS — host memory between 25% progress and completion must not
  grow with the corpus (the accumulators are chunked + O(detections),
  never O(corpus x anything));
* bounded manifest growth — elastic chunk manifests stay
  ceil(tiles/chunk) files with O(detections) bytes;
* sustained throughput accounting — PipelineStats tallies every tile
  exactly once.

The model forward is STUBBED (a counted fake infer emitting a
deterministic ~0.15 det/tile): the soak exercises the orchestration —
store streaming, batching, chunk checkpointing, spec tables, geocoding,
manifest IO — not the MXU. Store blobs share ONE 64px JPEG so the
decode cost stays host-feasible while every byte still flows through
BlobStore.get (the reference's GCS transport shape).

    python scripts/pod_soak.py [N_TILES]   # default 60000; appends a row
                                           # to BENCH_POST.jsonl
"""

from __future__ import annotations

import io
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

TILE = 64
CHUNK = 4096
RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_POST.jsonl")


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


class SyntheticStore:
    """BlobStore serving N keys, all backed by one shared JPEG payload."""

    def __init__(self, n: int, payload: bytes):
        self._keys = [
            f"corpus/ORTHOIMAGERY.ORTHOPHOTOS{2014 + (i % 3)}_{i}_0_0.jpeg"
            for i in range(n)
        ]
        self._payload = payload
        self.get_count = 0

    def list(self, prefix: str = ""):
        return [k for k in self._keys if k.startswith(prefix)]

    def exists(self, key: str) -> bool:
        return key in set(self._keys)

    def get(self, key: str) -> bytes:
        self.get_count += 1
        return self._payload

    def put(self, key: str, data: bytes) -> None:  # pragma: no cover
        raise NotImplementedError


def run_soak(n_tiles: int, checkpoint_dir: str, out_path: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    import aquaculture_tpu.pipeline as pipeline
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.geo import polygon as _poly
    from aquaculture_tpu.parallel.pod import run_pod_pipeline

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (TILE, TILE, 3), dtype=np.uint8)).save(
        buf, format="JPEG", quality=85
    )
    store = SyntheticStore(n_tiles, buf.getvalue())
    paths = store.list("corpus/")

    # one download box per bbox_ind so every tile geocodes
    dl = gf.GeoFrame(
        {"d": list(range(n_tiles))},
        geometry=[
            _poly.box(1200.0 * i, 0.0, 1200.0 * (i + 1), 1200.0)
            for i in range(n_tiles)
        ],
        crs=3857,
    )

    # Fake infer: ~0.15 det/tile deterministic; also samples RSS per call
    # so boundedness is observed DURING the run, not just at the end.
    state = {"tile": 0, "rss": []}

    def fake_make_infer_fn(model, params, cfg, tile=TILE, batch_size=32):
        def infer(params, images):
            b = images.shape[0]
            det = np.zeros((b, 4, 6), np.float32)
            valid = np.zeros((b, 4), bool)
            for i in range(b):
                t = state["tile"] + i
                if t % 7 == 0:
                    det[i, 0] = (8.0, 8.0, 40.0, 40.0, 0.9, 0.0)
                    valid[i, 0] = True
                    if t % 21 == 0:
                        det[i, 1] = (20.0, 20.0, 60.0, 60.0, 0.8, 1.0)
                        valid[i, 1] = True
            state["tile"] += b
            state["rss"].append((state["tile"], _rss_mb()))
            return det, valid

        return infer

    orig = pipeline.make_infer_fn
    pipeline.make_infer_fn = fake_make_infer_fn
    try:
        t0 = time.perf_counter()
        det, stats = run_pod_pipeline(
            paths,
            model=None,
            params=None,
            download_bboxes=dl,
            cfg=DetectConfig(img_size=TILE),
            batch_size=256,
            out_path=out_path,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=CHUNK,
            store=store,
        )
        wall = time.perf_counter() - t0
    finally:
        pipeline.make_infer_fn = orig

    # bounded RSS: compare the RSS once 25% of the corpus has streamed
    # with the maximum afterwards (startup allocations excluded)
    samples = state["rss"]
    quarter = next(r for t, r in samples if t >= n_tiles // 4)
    late_max = max(r for t, r in samples if t >= n_tiles // 4)
    manifest_files = [
        f for f in os.listdir(checkpoint_dir) if not f.startswith(".")
    ]
    manifest_bytes = sum(
        os.path.getsize(os.path.join(checkpoint_dir, f)) for f in manifest_files
    )
    return {
        "metric": "pod_soak_tiles_per_sec_host_orchestration",
        "n_tiles": n_tiles,
        "tiles": stats.tiles,
        "detections": len(det),
        "tiles_per_s": round(stats.tiles / wall, 1),
        "wall_s": round(wall, 1),
        "rss_quarter_mb": round(quarter, 1),
        "rss_late_max_mb": round(late_max, 1),
        "rss_growth_mb": round(late_max - quarter, 1),
        "manifest_files": len(manifest_files),
        "manifest_mb": round(manifest_bytes / 1e6, 2),
        "store_gets": store.get_count,
    }


def main() -> None:
    import tempfile

    n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 60000
    work = tempfile.mkdtemp(prefix="aq_soak_")
    row = run_soak(n, os.path.join(work, "ckpt"), os.path.join(work, "out.geojson"))
    print(json.dumps(row))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
