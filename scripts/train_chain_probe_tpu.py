"""True device-side training step time: K steps chained in ONE jit program.

The round-4 `latency_device` attribution (scripts/latency_tpu.py) showed
every synchronous tunneled call pays ~26 ms of remote dispatch+transfer.
The training sweep (scripts/train_sweep_tpu.py) times 8 SEPARATE
dispatches of the compiled step, so its ms/step upper-bounds device
compute by up to that dispatch cost — IF the async queue fails to
pipeline through the tunnel. This probe settles it: chain K full train
steps (loss + grouped SGD + EMA) inside one jit via `lax.fori_loop` with
the TrainState carried (every iteration truly depends on the previous,
so nothing hoists; the total loss is accumulated into the carry so the
metrics epilogue can't DCE) and compare per-step time against the
same-session per-call harness.

  chained == per-call  ->  the sweep harness is device-true: the async
                           dispatch pipeline hides the tunnel, and the
                           published img/s + MFU stand as measured.
  chained  < per-call  ->  the gap IS tunnel dispatch; the chained number
                           is the honest device MFU and reporting updates.

Appends {"mode": "chained_ab", ...} to BENCH_TRAIN.jsonl.

    python scripts/train_chain_probe_tpu.py [--variant mt] [--k 8]
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_TRAIN.jsonl")
IMG = 640
PEAK_FLOPS = 197e12  # v5e bf16 peak


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", default="mt")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--img", type=int, default=IMG,
                    help="image size (non-default = smoke test, row not recorded)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip; default forces CPU (probing "
                         "axon HANGS during a tunnel outage — CLAUDE.md)")
    args = ap.parse_args()

    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    if not args.tpu:
        # must precede any backend init (CLAUDE.md: env overrides are
        # clobbered by the boot-time axon register)
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step

    model, params = yolov5_init(args.variant, num_classes=5, seed=0)
    cfg = TrainConfig(
        img_size=args.img, batch_size=args.batch, max_boxes_per_image=32,
        compute_dtype="bfloat16",
    )
    state = init_train_state(model, params)
    step_fn = make_train_step(model, cfg, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    m = cfg.max_boxes_per_image
    batch_data = {
        "images": jnp.asarray(rng.random((args.batch, args.img, args.img, 3), dtype=np.float32)),
        "labels": jnp.asarray(
            np.stack(
                [
                    rng.integers(0, 5, (args.batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (args.batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (args.batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (args.batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (args.batch, m)).astype(np.float32),
                ],
                axis=-1,
            )
        ),
        "label_mask": jnp.asarray(rng.random((args.batch, m)) > 0.3),
    }
    state = jax.device_put(state)

    K = args.k

    def chained(state, batch):
        def body(i, carry):
            s, acc = carry
            new_s, metrics = step_fn(s, batch)
            return new_s, acc + metrics["total"]

        return jax.lax.fori_loop(
            0, K, body, (state, jnp.asarray(0.0, jnp.float32)))

    t0 = time.perf_counter()
    chain_c = jax.jit(chained, donate_argnums=0).lower(state, batch_data).compile()
    chain_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    call_c = jax.jit(step_fn, donate_argnums=0).lower(state, batch_data).compile()
    call_compile_s = time.perf_counter() - t0

    def flops_of(compiled):
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)) or None
        except Exception:
            return None

    # per-call harness, identical to train_sweep_tpu.py (warmup 2, 8 steps)
    s = state
    for _ in range(2):
        s, _metrics = call_c(s, batch_data)
    jax.block_until_ready(s.params)
    t0 = time.perf_counter()
    for _ in range(K):
        s, _metrics = call_c(s, batch_data)
    jax.block_until_ready(s.params)
    percall_ms = (time.perf_counter() - t0) * 1e3 / K

    # chained harness: reps runs of one K-step program (fresh state each
    # rep would need re-device_put; the carry is donated so re-feed the
    # surviving state — step count only shifts the LR schedule, not work)
    s2, acc = chain_c(s, batch_data)
    jax.block_until_ready(s2.params)  # warm
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        s2, acc = chain_c(s2, batch_data)
        jax.block_until_ready(s2.params)
        times.append(time.perf_counter() - t0)
    chained_ms = float(np.median(times)) * 1e3 / K

    call_flops = flops_of(call_c)
    row = {
        "mode": "chained_ab",
        "variant": args.variant,
        "batch": args.batch,
        "k": K,
        "backend": jax.default_backend(),
        "percall_ms_per_step": round(percall_ms, 1),
        "chained_ms_per_step": round(chained_ms, 1),
        "dispatch_ms_per_step": round(percall_ms - chained_ms, 1),
        "percall_img_s": round(args.batch / (percall_ms / 1e3), 1),
        "chained_img_s": round(args.batch / (chained_ms / 1e3), 1),
        "chain_compile_s": round(chain_compile_s, 1),
        "call_compile_s": round(call_compile_s, 1),
    }
    if call_flops:
        row["percall_mfu_pct"] = round(call_flops / (percall_ms / 1e3) / PEAK_FLOPS * 100, 2)
        row["chained_mfu_pct"] = round(call_flops / (chained_ms / 1e3) / PEAK_FLOPS * 100, 2)
    print(json.dumps(row))
    if args.img == IMG and args.tpu:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
