"""Micro-benchmark: NMS candidate prep with two-stage vs global top-k.

The P6 ablation (BENCHMARKS.md round 3) showed the candidate prep's
global top_k over the 100,800-anchor 1280px pool costing most of the NMS
side. This times the full vmapped prep (conf + top-k + fused gather) at
both serving geometries with the exact two-stage blocked top-k ON (the
round-3 default for large pools) vs forced single-stage.

Appends to BENCH_TOPK.jsonl.
"""


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_TOPK.jsonl")
CONFIGS = [
    # (name, batch, n_anchors, two_stage)
    ("p6_pool_two_stage", 32, 100_800, True),
    ("p6_pool_global", 32, 100_800, False),
    ("p5_pool_two_stage", 128, 25_200, True),
    ("p5_pool_global", 128, 25_200, False),
]
WARMUP = 3
WINDOWS = 3
BPW = 8


def main():
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    # `from aquaculture_tpu.ops import nms` resolves to the FUNCTION
    # re-exported by ops/__init__ — importlib reliably returns the module
    import importlib

    N = importlib.import_module("aquaculture_tpu.ops.nms")

    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["config"])
                except Exception:
                    pass

    ratio0 = N._TWO_STAGE_RATIO
    for name, batch, n, two_stage in CONFIGS:
        if name in done:
            continue
        N._TWO_STAGE_RATIO = ratio0 if two_stage else 10**9
        try:
            rng = np.random.default_rng(0)
            pred = jnp.asarray(rng.random((batch, n, 10), dtype=np.float32))

            def prep(p):
                return jax.vmap(
                    lambda q: N._prepare_candidates(q, 0.25, 1024, False)
                )(p)

            jitted = jax.jit(prep)
            t0 = time.perf_counter()
            compiled = jitted.lower(pred).compile()
            compile_s = time.perf_counter() - t0
            out = compiled(pred)
            for _ in range(WARMUP):
                out = compiled(pred)
            jax.block_until_ready(out)
            rates = []
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                for _ in range(BPW):
                    out = compiled(pred)
                jax.block_until_ready(out)
                rates.append(batch * BPW / (time.perf_counter() - t0))
            v = float(np.median(rates))
            rec = {
                "config": name, "batch": batch, "n_anchors": n,
                "prep_imgs_per_s": round(v, 1),
                "prep_ms_per_img": round(1000.0 / v, 4),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            rec = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        finally:
            N._TWO_STAGE_RATIO = ratio0
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
