"""Per-stage slack attribution of the SHIPPING serving config (mt, bf16,
b128, 640px) on the real chip — VERDICT r4 #1.

mt measures 47.9% MFU against a 64.2% conv-roofline ceiling (75% of
ceiling) while l/x sustain 83-86%; this ladder attributes the ~25%
non-roofline residual per stage by differencing successively larger
jitted programs (the same protocol as scripts/infer_ablation_tpu.py,
which priced the m variant in round 2):

  input_cast — images f32->bf16 cast alone (HBM-bound floor)
  conv_id    — conv pyramid, identity activation (pure MXU path)
  fwd_raw    — + SiLU epilogues
  fwd_decode — + head decode (sigmoid/grid/anchor math)
  fwd_prep   — + NMS candidate prep (conf mask, two-stage top-k, gather)
  fwd_supp   — + Pallas greedy suppression
  full       — + max_det compaction top-k (== bench.py program)

Each row records tiles/s, ms/img, and the compiled program's XLA-counted
FLOPs + HBM bytes (cost_analysis), so every increment can be compared
with its own roofline bound (MXU 197 TF/s bf16, HBM 819 GB/s on v5e).

Resumable: one config per process with --one (the tunnel compiles are
the slow part; the persistent .jax_cache makes reruns cheap). Appends
to BENCH_MT_SLACK.jsonl.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/mt_slack_tpu.py [--one]
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "..", "BENCH_MT_SLACK.jsonl")
CONFIGS = [
    "input_cast", "conv_id", "fwd_raw", "fwd_decode",
    "fwd_prep", "fwd_supp", "full",
    # prep-internal attribution (round-5b): score computation alone, then
    # + top-k, then + gathers (== fwd_prep)
    "fwd_score", "fwd_topk",
    # round-5c: the lane-efficient feats-direct candidates path
    # (ops/nms.batched_nms_feats) vs `full` (the rows path)
    "full_feats",
    # round-5d: feats-prep internals — cols build+score+topk only, then
    # + survivor gathers/decode (== prep portion of full_feats)
    "feats_topk", "feats_prep",
    # round-5e: rows-path gather levers — XLA gather flags (unique +
    # in-bounds), and index-sorted gather + small-table unsort
    "prep_hint", "prep_sorted",
    # round-5f: the full serving program after adopting the flagged
    # gather in _prepare_candidates (same code path as `full`)
    "full_hint",
    # round-5g: candidate-pool cap at 512 (halves top-k stage 2, the
    # suppression kernel's K^2 scan, and the gathers; semantic change —
    # only shippable behind an mAP gate)
    "full_topk512",
]
VARIANT = "mt"
BATCH = 128
IMG = 640
WARMUP = 3
WINDOWS = 3
BPW = 8


def done():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    out.add(json.loads(line)["config"])
                except Exception:
                    pass
    return out


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def run(config: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.models import layers as L
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.ops.nms import batched_nms

    model, params = yolov5_init(VARIANT, num_classes=5, seed=0)
    params = model.fuse(params)
    cfg = DetectConfig()

    orig_silu = L.silu
    if config == "conv_id":
        L.silu = lambda x: x

    def fn(params, images):
        x = images.astype(jnp.bfloat16)
        if config == "input_cast":
            return x.sum()
        if config in ("fwd_raw", "conv_id"):
            feats, _ = model.features(params, x)
            return [f.sum() for f in feats]
        if config == "full_feats":
            from aquaculture_tpu.ops.nms import batched_nms_feats

            feats, _ = model.features(params, x)
            return batched_nms_feats(
                feats, model.anchor_table, model.strides,
                conf_thresh=cfg.conf_threshold,
                iou_thresh=cfg.iou_threshold,
                max_det=cfg.max_detections,
                pre_topk=cfg.pre_nms_topk,
            )
        if config in ("feats_topk", "feats_prep"):
            import importlib

            N = importlib.import_module("aquaculture_tpu.ops.nms")
            feats, _ = model.features(params, x)
            if config == "feats_prep":
                boxes, nmsb, ts, ct, va = N._prepare_candidates_feats(
                    feats, model.anchor_table, model.strides,
                    cfg.conf_threshold, cfg.pre_nms_topk, False,
                )
                return boxes.sum() + ts.sum() + va.sum()
            # cols build + score + topk only (no survivor gathers/decode)
            b = feats[0].shape[0]
            na = len(model.anchor_table[0])
            C = feats[0].shape[-1]
            no = C // na
            cols_l = []
            hw_tot = 0
            for f in feats:
                _, h, w, _ = f.shape
                hw_tot += h * w
                cols_l.append(jnp.transpose(
                    f.reshape(b, h * w, C).astype(jnp.float32), (0, 2, 1)))
            cols = jnp.concatenate(cols_l, axis=-1).reshape(b, na, no, hw_tot)
            cols = jnp.transpose(cols, (0, 2, 1, 3)).reshape(b, no, na * hw_tot)
            obj = jax.nn.sigmoid(cols[:, 4])
            clsz = jax.nn.sigmoid(cols[:, 5:]) * obj[:, None, :]
            conf = clsz.max(axis=1)
            score = jnp.where(conf >= cfg.conf_threshold, conf, -1.0)
            vals, q = jax.vmap(
                lambda s: N._select_topk(s, cfg.pre_nms_topk, False))(score)
            return vals.sum() + q.sum()
        preds, _ = model.apply(params, x)
        if config == "fwd_decode":
            return preds.sum()
        if config in ("fwd_score", "fwd_topk"):
            import importlib

            N = importlib.import_module("aquaculture_tpu.ops.nms")

            def _score(p):
                p = p.astype(jnp.float32)
                obj = p[:, 4]
                cls_scores = p[:, 5:] * obj[:, None]
                cls_id = jnp.argmax(cls_scores, axis=-1)
                conf = jnp.max(cls_scores, axis=-1)
                score = jnp.where(conf >= cfg.conf_threshold, conf, -1.0)
                return score, cls_id

            if config == "fwd_score":
                s, c = jax.vmap(_score)(preds)
                return s.sum() + c.sum()

            def _topk(p):
                score, cls_id = _score(p)
                vals, idx = N._select_topk(score, cfg.pre_nms_topk, False)
                return vals, idx, cls_id

            v, i, c = jax.vmap(_topk)(preds)
            return v.sum() + i.sum() + c.sum()
        if config in ("prep_hint", "prep_sorted"):
            import importlib

            N = importlib.import_module("aquaculture_tpu.ops.nms")

            def _prep2(p):
                p = p.astype(jnp.float32)
                obj = p[:, 4]
                cls_scores = p[:, 5:] * obj[:, None]
                cls_id = jnp.argmax(cls_scores, axis=-1)
                conf = jnp.max(cls_scores, axis=-1)
                score = jnp.where(conf >= cfg.conf_threshold, conf, -1.0)
                top_scores, top_idx = N._select_topk(score, cfg.pre_nms_topk, False)
                base = jnp.concatenate(
                    [p[:, 0:4], cls_id.astype(jnp.float32)[:, None]], axis=1
                )
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,))
                if config == "prep_sorted":
                    order = jnp.argsort(top_idx)
                    idx_s = top_idx[order]
                    sel_s = jax.lax.gather(
                        base, idx_s[:, None], dn, slice_sizes=(1, base.shape[1]),
                        indices_are_sorted=True, unique_indices=True,
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                    inv = jnp.argsort(order)
                    sel = jnp.take(sel_s, inv, axis=0)
                else:
                    sel = jax.lax.gather(
                        base, top_idx[:, None], dn, slice_sizes=(1, base.shape[1]),
                        indices_are_sorted=False, unique_indices=True,
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                return sel, top_scores

            sel, ts = jax.vmap(_prep2)(preds)
            return sel.sum() + ts.sum()
        if config in ("fwd_prep", "fwd_supp"):
            import importlib

            N = importlib.import_module("aquaculture_tpu.ops.nms")

            prep = jax.vmap(
                lambda p: N._prepare_candidates(
                    p, cfg.conf_threshold, cfg.pre_nms_topk, False
                )
            )
            boxes, nms_boxes, top_scores, cls_top, valid = prep(preds)
            if config == "fwd_prep":
                return boxes.sum() + top_scores.sum() + valid.sum()
            from aquaculture_tpu.ops.nms_pallas import greedy_suppress_pallas

            keep = greedy_suppress_pallas(nms_boxes, valid, cfg.iou_threshold)
            return boxes.sum() + keep.sum()
        return batched_nms(
            preds,
            conf_thresh=cfg.conf_threshold,
            iou_thresh=cfg.iou_threshold,
            max_det=cfg.max_detections,
            pre_topk=512 if config == "full_topk512" else cfg.pre_nms_topk,
        )

    try:
        rng = np.random.default_rng(0)
        images = jax.device_put(
            jnp.asarray(rng.random((BATCH, IMG, IMG, 3), dtype=np.float32))
        )
        params = jax.device_put(params)
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        compiled = jitted.lower(params, images).compile()
        compile_s = time.perf_counter() - t0
        flops, hbm_bytes = _cost(compiled)

        out = compiled(params, images)
        for _ in range(WARMUP):
            out = compiled(params, images)
        jax.block_until_ready(out)
        rates = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(BPW):
                out = compiled(params, images)
            jax.block_until_ready(out)
            rates.append(BATCH * BPW / (time.perf_counter() - t0))
        v = float(np.median(rates))
    finally:
        L.silu = orig_silu
    return {
        "config": config,
        "variant": VARIANT,
        "batch": BATCH,
        "tiles_per_s": round(v, 1),
        "ms_per_img": round(1000.0 / v, 4),
        "gflops_per_img": round(flops / BATCH / 1e9, 2) if flops else None,
        "hbm_mb_per_img": round(hbm_bytes / BATCH / 1e6, 2) if hbm_bytes else None,
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    cache = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    seen = done()
    todo = [c for c in CONFIGS if c not in seen]
    if not todo:
        print("all configs done")
        return
    for c in todo:
        print(f"running {c} ...", flush=True)
        try:
            r = run(c)
        except Exception as e:
            r = {"config": c, "error": f"{type(e).__name__}: {e}"[:300]}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
        if "--one" in sys.argv:
            break


if __name__ == "__main__":
    main()
