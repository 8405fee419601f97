"""Training-step attribution on the real chip (VERDICT r2 next #4).

Where do the 351 ms of the batch-128 bf16 YOLOv5m train step go? Configs
jit successive prefixes of the step so the deltas attribute each phase:

  fwd_loss   — forward + loss (value only, no grad)
  fwd_bwd    — value_and_grad (forward + backward), no update
  bwd_sgd    — + grouped-SGD update (warmup/LR math, momenta)
  full       — + EMA update (the production step; matches BENCH_TRAIN)
  host_feed  — CPU-side DetectionDataset augmented feed rate (img/s) on
               this host (1 core in the sandbox — the per-core number the
               multi-core TPU-VM host multiplies)

One config per invocation (tunnel compiles take minutes; persistent cache
makes re-runs cheap). Appends to BENCH_TRAIN_ABLATION.jsonl.

    python scripts/train_ablation_tpu.py [--one] [--batch 128]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
RESULTS = os.path.join(ROOT, "BENCH_TRAIN_ABLATION.jsonl")
# Round-5 program-shape levers (VERDICT r4 #2) on the PRODUCTION variant
# (mt): "XLA-scheduling-bound" rested on one probe (phase-grad); these are
# the untried restructurings. mt_full is the same-protocol baseline; accum
# changes fusion shapes without the tunnel-blocked b192 compile; split
# breaks the step into two jitted programs (different scheduling problem);
# remat trades FLOPs for live-range pressure; nodonate quantifies what
# donation buys (the donation audit's A/B, with memory_analysis fields).
CONFIGS = [
    "fwd_loss", "fwd_bwd", "bwd_sgd", "full", "host_feed",
    "mt_full", "mt_accum2", "mt_accum4", "mt_split", "mt_remat",
    "mt_nodonate",
]
IMG = 640
WARMUP = 2
STEPS = 8
PEAK_FLOPS = 197e12


def done():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "error" not in r:
                        out.add((r["config"], r["batch"]))
                except Exception:
                    pass
    return out


def _batch_data(batch, m, rng):
    import jax.numpy as jnp

    return {
        "images": jnp.asarray(rng.random((batch, IMG, IMG, 3), dtype=np.float32)),
        "labels": jnp.asarray(
            np.stack(
                [
                    rng.integers(0, 5, (batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (batch, m)).astype(np.float32),
                    rng.uniform(32, 600, (batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (batch, m)).astype(np.float32),
                    rng.uniform(8, 64, (batch, m)).astype(np.float32),
                ],
                axis=-1,
            )
        ),
        "label_mask": jnp.asarray(rng.random((batch, m)) > 0.3),
    }


def run_config(name: str, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.ema import ema_update
    from aquaculture_tpu.train.loss import yolo_loss
    from aquaculture_tpu.train.optimizer import sgd_update
    from aquaculture_tpu.train.trainer import TrainState, init_train_state, make_train_step

    cfg = TrainConfig(img_size=IMG, batch_size=batch, max_boxes_per_image=32)

    if name == "host_feed":
        # CPU path: measure the augmented host feed (mosaic/HSV/flip +
        # jax-resize base cache) at training geometry on real rendered
        # tiles. Runs in its own subprocess with JAX_PLATFORMS=cpu (main()
        # dispatches it) so the base-resize cache never round-trips the
        # TPU tunnel.
        sys.path.insert(0, os.path.join(ROOT, "examples"))
        from end_to_end_demo import render_world

        from aquaculture_tpu.train.dataset import DetectionDataset

        world = "/tmp/aq_feed_world"
        img_dir, lab_dir = render_world(world, n_images=24, seed=0)
        dcfg = TrainConfig(img_size=IMG, batch_size=batch, max_boxes_per_image=32)
        ds = DetectionDataset(img_dir, lab_dir, dcfg, augment=True, seed=0)
        # warm the per-size resize cache (one pass), then time a full epoch
        n = 0
        for b in ds.epoch(0):
            n += len(b["images"])
        t0 = time.perf_counter()
        n = 0
        for b in ds.epoch(1):
            n += len(b["images"])
        dt = time.perf_counter() - t0
        return {
            "config": name, "batch": batch, "img_per_s_host": round(n / dt, 1),
            "host_cores": os.cpu_count(),
        }

    variant = "mt" if name.startswith("mt_") else "m"
    if name == "mt_remat":
        cfg = TrainConfig(
            img_size=IMG, batch_size=batch, max_boxes_per_image=32, remat=True
        )
    model, params = yolov5_init(variant, num_classes=5, seed=0)
    state = init_train_state(model, params)

    def loss_fn(params, batch_d):
        feats, new_params = model.features(
            params, batch_d["images"].astype(jnp.bfloat16), True
        )
        loss, metrics = yolo_loss(
            feats, batch_d["labels"], batch_d["label_mask"],
            model.anchor_table, model.num_classes, strides=model.strides,
            box_gain=cfg.box_gain, cls_gain=cfg.cls_gain, obj_gain=cfg.obj_gain,
            anchor_t=cfg.anchor_t,
        )
        return loss, (new_params, metrics)

    if name == "fwd_loss":
        def step(state, batch_d):
            loss, _aux = loss_fn(state.params, batch_d)
            return state, {"total": loss}
    elif name == "fwd_bwd":
        def step(state, batch_d):
            grads, (new_params, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, batch_d
            )
            # consume grads without an update so XLA can't DCE the backward
            gsum = sum(jnp.abs(g).sum() for g in jax.tree_util.tree_leaves(grads))
            return state, {"total": metrics["total"] + 0.0 * gsum, "gsum": gsum}
    elif name == "bwd_sgd":
        def step(state, batch_d):
            grads, (new_params, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, batch_d
            )
            params2, opt = sgd_update(new_params, grads, state.opt, 100, cfg)
            return TrainState(params=params2, opt=opt, ema=state.ema,
                              step=state.step + 1), metrics
    elif name in ("full", "mt_full", "mt_nodonate", "mt_remat"):
        step = make_train_step(model, cfg, steps_per_epoch=100)
    elif name in ("mt_accum2", "mt_accum4"):
        # Gradient-accumulation microbatching: B/n microbatches through a
        # lax.scan accumulating grads, one SGD+EMA update. Same total
        # FLOPs; smaller per-program activation live ranges and different
        # fusion shapes (the b192-equivalent lever that doesn't need the
        # tunnel-blocked big compile).
        n_micro = 2 if name == "mt_accum2" else 4
        mb = batch // n_micro

        def step(state, batch_d):
            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape((n_micro, mb) + x.shape[1:]), batch_d
            )

            def micro(carry, mb_d):
                gacc, _ = carry
                grads, (new_params, metrics) = jax.grad(loss_fn, has_aux=True)(
                    state.params, mb_d
                )
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                return (gacc, new_params), metrics

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_params), metrics_seq = jax.lax.scan(
                micro, (g0, state.params), mbs
            )
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
            metrics = jax.tree_util.tree_map(lambda x: x.mean(0), metrics_seq)
            params2, opt = sgd_update(new_params, grads, state.opt, 100, cfg)
            ema = ema_update(state.ema, params2, state.step + 1, cfg.ema_decay)
            return (
                TrainState(params=params2, opt=opt, ema=ema, step=state.step + 1),
                metrics,
            )
    elif name == "mt_split":
        # Two separately-jitted programs: (fwd+bwd) and (SGD+EMA update) —
        # gives XLA two smaller scheduling problems at the cost of
        # materializing the grads between them.
        def grad_prog(params, batch_d):
            grads, (new_params, metrics) = jax.grad(loss_fn, has_aux=True)(
                params, batch_d
            )
            return grads, new_params, metrics

        def update_prog(state, grads, new_params):
            params2, opt = sgd_update(new_params, grads, state.opt, 100, cfg)
            ema = ema_update(state.ema, params2, state.step + 1, cfg.ema_decay)
            return TrainState(params=params2, opt=opt, ema=ema, step=state.step + 1)

        g_jit = jax.jit(grad_prog)
        u_jit = jax.jit(update_prog, donate_argnums=(0, 1, 2))

        rng = np.random.default_rng(0)
        batch_d = _batch_data(batch, cfg.max_boxes_per_image, rng)
        state = jax.device_put(state)
        t_c = time.perf_counter()
        g_c = g_jit.lower(state.params, batch_d).compile()
        u_c = u_jit.lower(
            state,
            jax.eval_shape(lambda s: s.params, state),
            jax.eval_shape(lambda s: s.params, state),
        ).compile()
        compile_s = time.perf_counter() - t_c
        flops = 0.0
        for c in (g_c, u_c):
            try:
                ca = c.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops += float(ca.get("flops", 0.0))
            except Exception:
                pass

        def one(state):
            grads, new_params, metrics = g_c(state.params, batch_d)
            return u_c(state, grads, new_params), metrics

        for _ in range(WARMUP):
            state, metrics = one(state)
        jax.block_until_ready(metrics["total"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = one(state)
        jax.block_until_ready(metrics["total"])
        dt = (time.perf_counter() - t0) / STEPS
        return {
            "config": name, "batch": batch, "variant": variant,
            "ms_per_step": round(dt * 1000, 2),
            "img_per_s": round(batch / dt, 1),
            "step_tflops": round(flops / 1e12, 2) if flops else None,
            "mfu_pct": round(100 * flops / dt / PEAK_FLOPS, 2) if flops else None,
            "compile_s": round(compile_s, 1),
        }
    else:
        raise ValueError(name)

    donate = () if name == "mt_nodonate" else (0,)
    jitted = jax.jit(step, donate_argnums=donate)
    rng = np.random.default_rng(0)
    batch_d = _batch_data(batch, cfg.max_boxes_per_image, rng)
    state = jax.device_put(state)

    t_c = time.perf_counter()
    compiled = jitted.lower(state, batch_d).compile()
    compile_s = time.perf_counter() - t_c
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    if flops and name in ("mt_accum2", "mt_accum4"):
        # cost_analysis counts a lax.scan body ONCE; the step executes it
        # n_micro times — scale so MFU is comparable across configs
        flops *= 2 if name == "mt_accum2" else 4
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "alias_mb": round(ma.alias_size_in_bytes / 1e6, 1),
        }
    except Exception:
        pass

    for _ in range(WARMUP):
        state, metrics = compiled(state, batch_d)
    jax.block_until_ready(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch_d)
    jax.block_until_ready(metrics["total"])
    dt = (time.perf_counter() - t0) / STEPS

    out = {
        "config": name,
        "batch": batch,
        "variant": variant,
        "ms_per_step": round(dt * 1000, 2),
        "img_per_s": round(batch / dt, 1),
        "step_tflops": round(flops / 1e12, 2) if flops else None,
        "mfu_pct": round(100 * flops / dt / PEAK_FLOPS, 2) if flops else None,
        "compile_s": round(compile_s, 1),
    }
    out.update(mem)
    return out


def main():
    cache = os.path.abspath(os.path.join(ROOT, ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = 128
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--host-feed-only" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        r = run_config("host_feed", batch)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        return

    fin = done()
    todo = [c for c in CONFIGS if (c, batch) not in fin]
    if not todo:
        print("all configs done")
        return
    for name in todo:
        print(f"running {name} batch={batch} ...", flush=True)
        if name == "host_feed":
            import subprocess

            env = dict(os.environ, JAX_PLATFORMS="cpu")
            subprocess.run(
                [sys.executable, __file__, "--host-feed-only", "--batch", str(batch)],
                env=env, check=False,
            )
            continue
        try:
            r = run_config(name, batch)
        except Exception as e:
            r = {"config": name, "batch": batch,
                 "error": f"{type(e).__name__}: {e}"[:300]}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        if "--one" in sys.argv:
            break


if __name__ == "__main__":
    main()
