"""P6 accuracy A/B at equal ground coverage (VERDICT r2 next #5, mAP half).

Question: for the same ground area and the same effective resolution, is
one P6 pass over a big tile better than four P5 passes over subtiles?
Demo-scale proxy for m6@1280-vs-m@4x640 (CPU-trainable):

  arm p6     — n6 served at 320px over the whole 1024px tile
               (3.2x downscale, stride-64 level active)
  arm tiled  — n served at 160px over four 512px subtiles
               (3.2x downscale each; detections mapped back to tile coords)

Both arms train 1,200 steps on the same 24-image world (each at its own
serving geometry — the fair protocol: you deploy what you train).
Appends JSON rows to BENCH_P6_ACCURACY.jsonl.

    python scripts/p6_accuracy_ab.py --out /tmp/aq_p6
"""

import argparse
import glob
import json
import os
import sys

import numpy as np


def train_variant(img_dir, lab_dir, variant, img_size, epochs, out_dir):
    import jax
    import jax.numpy as jnp

    from aquaculture_tpu.config import TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.train.dataset import DetectionDataset
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step
    from aquaculture_tpu.utils.checkpoint import save_params
    from aquaculture_tpu.utils.logging import log_info

    if os.path.exists(os.path.join(out_dir, "treedef.json")):
        log_info("checkpoint %s exists; skipping train", out_dir)
        return
    cfg = TrainConfig(img_size=img_size, batch_size=4, epochs=epochs, mosaic=0.5)
    ds = DetectionDataset(img_dir, lab_dir, cfg, augment=False, seed=0)
    model, params = yolov5_init(variant, num_classes=2, seed=0)
    state = init_train_state(model, params)
    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)
    for epoch in range(cfg.epochs):
        for batch in ds.epoch(epoch):
            state, last = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if (epoch + 1) % 50 == 0:
            log_info("%s epoch %d/%d loss %.3f", variant, epoch + 1, cfg.epochs,
                     float(last["total"]))
    save_params(out_dir, state.ema, metadata={"variant": variant, "num_classes": 2})


def eval_arm(paths, lab_dir, ckpt, variant, img_size, tile):
    """mAP with detections mapped back to full-tile pixel coords."""
    from aquaculture_tpu.config import DetectConfig
    from aquaculture_tpu.eval.accuracy import load_checkpoint_f32, load_world_ground_truths
    from aquaculture_tpu.eval.map import evaluate_map
    from aquaculture_tpu.pipeline import detect_files

    model, params = load_checkpoint_f32(ckpt, variant, 2)
    cfg = DetectConfig(img_size=img_size, conf_threshold=1e-3)
    boxes, conf, cls, specs, _ = detect_files(
        paths, model, params, cfg, batch_size=8, tile=tile, use_native=False
    )
    per = {}
    for i, sp in enumerate(specs):
        # regroup subtiles into their parent tile; offsets map boxes back
        per.setdefault(sp.bbox_ind, []).append(i)
    gts = load_world_ground_truths(lab_dir)
    d_list, g_list = [], []
    for stem, gb, gk in gts:
        bbox_ind = int(stem.split("_")[1])
        idx = per.get(bbox_ind, [])
        if idx:
            db = np.stack(
                [
                    boxes[i].astype(float)
                    + np.array([specs[i].x_offset, specs[i].y_offset] * 2)
                    for i in idx
                ]
            )
            dc, dk = conf[np.asarray(idx)], cls[np.asarray(idx)]
        else:
            db, dc, dk = np.zeros((0, 4)), np.zeros(0), np.zeros(0, int)
        d_list.append((db, dc, dk))
        g_list.append((gb, gk))
    return evaluate_map(d_list, g_list, num_classes=2)


def build_subtile_world(img_dir, lab_dir, out_dir, tile=512):
    """Split the 1024px world into tile-px crops with re-normalized labels
    (the tiled arm's TRAINING distribution must match its serving geometry:
    512px crops, not whole tiles)."""
    from PIL import Image

    s_img = os.path.join(out_dir, "images")
    s_lab = os.path.join(out_dir, "labels")
    if os.path.isdir(s_img) and glob.glob(os.path.join(s_img, "*.jpeg")):
        return s_img, s_lab
    os.makedirs(s_img, exist_ok=True)
    os.makedirs(s_lab, exist_ok=True)
    for p in sorted(glob.glob(os.path.join(img_dir, "*.jpeg"))):
        stem = os.path.basename(p)[:-5]
        arr = np.asarray(Image.open(p).convert("RGB"))
        size = arr.shape[0]
        rows = np.loadtxt(os.path.join(lab_dir, stem + ".txt"), ndmin=2)
        b = rows[:, 1:5] * size  # cx cy w h px
        for yi in range(0, size, tile):
            for xi in range(0, size, tile):
                crop = arr[yi : yi + tile, xi : xi + tile]
                keep = []
                for (cls, cx, cy, w, h) in (np.column_stack([rows[:, 0], b]) if len(rows) else []):
                    x0, x1 = cx - w / 2 - xi, cx + w / 2 - xi
                    y0, y1 = cy - h / 2 - yi, cy + h / 2 - yi
                    cx0 = np.clip(x0, 0, tile); cx1 = np.clip(x1, 0, tile)
                    cy0 = np.clip(y0, 0, tile); cy1 = np.clip(y1, 0, tile)
                    if (cx1 - cx0) < 4 or (cy1 - cy0) < 4:
                        continue
                    if (cx1 - cx0) * (cy1 - cy0) < 0.25 * w * h:
                        continue  # mostly outside this crop
                    keep.append(
                        f"{int(cls)} {(cx0+cx1)/2/tile:.6f} {(cy0+cy1)/2/tile:.6f} "
                        f"{(cx1-cx0)/tile:.6f} {(cy1-cy0)/tile:.6f}"
                    )
                name = f"{stem}_sub{xi}_{yi}"
                Image.fromarray(crop).save(os.path.join(s_img, name + ".jpeg"), quality=92)
                with open(os.path.join(s_lab, name + ".txt"), "w") as f:
                    f.write("\n".join(keep) + ("\n" if keep else ""))
    return s_img, s_lab


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--arms", default="p6,tiled")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from end_to_end_demo import render_world

    img_dir, lab_dir = render_world(args.out, n_images=24, seed=0)
    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpeg")))
    results_path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_P6_ACCURACY.jsonl"
    )

    arms = {
        "p6": dict(variant="n6", img=320, tile=1024,
                   ckpt=os.path.join(args.out, "ckpt_n6_320")),
        "tiled": dict(variant="n", img=160, tile=512,
                      ckpt=os.path.join(args.out, "ckpt_n_160")),
    }
    for name in args.arms.split(","):
        a = arms[name]
        if name == "tiled":
            # train at the arm's serving geometry: 512px subtile crops at 160
            t_img, t_lab = build_subtile_world(
                img_dir, lab_dir, os.path.join(args.out, "subtiles"), tile=512
            )
        else:
            t_img, t_lab = img_dir, lab_dir
        # equal STEP budget across arms: the subtile world has 4x the
        # images (4x steps/epoch), so it gets 1/4 the epochs
        epochs = args.epochs if name == "p6" else max(1, args.epochs // 4)
        train_variant(t_img, t_lab, a["variant"], a["img"], epochs, a["ckpt"])
        m = eval_arm(paths, lab_dir, a["ckpt"], a["variant"], a["img"], a["tile"])
        rec = {"arm": name, **{k: v for k, v in a.items() if k != "ckpt"},
               "map50": round(m["map50"], 4), "map50_95": round(m["map"], 4),
               "epochs": args.epochs}
        print(json.dumps(rec), flush=True)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
