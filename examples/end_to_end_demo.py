"""End-to-end demo on a synthetic world: render cages, train, detect,
geocode, cluster, evaluate.

Runs in ~10 minutes on one CPU core (the "n" model at 160px) and reaches
mAP@.5 ~ 0.73 on the rendered 24-image world (0.86 on a 12-image world
with the same step budget), recovering all per-tile facilities —
the full reference workflow (README.md Run section) in one process:

    python examples/end_to_end_demo.py --out /tmp/aq_demo

The default quick run trains WITHOUT augmentation and overfits its own
world (that's fine for the same-world pipeline demo). For a model that
generalizes to unseen imagery, use the augmented recipe with the larger
budget it needs — measured 8x the held-out mAP of the no-aug path
(BENCHMARKS.md "Augmentation study"):

    python examples/end_to_end_demo.py --out /tmp/aq_demo \
        --augment --epochs 2400
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def render_world(
    out_dir: str,
    n_images: int = 24,
    size: int = 1024,
    seed: int = 0,
    r_range: tuple = (18, 40),
    clutter: float = 0.0,
    rotate: bool = False,
    contrast_jitter: float = 0.0,
):
    """Synthetic 'sea' tiles with bright circle/square cages + YOLO labels
    + a wanted_bboxes.csv grid. r_range widens the cage-scale distribution
    (the augmentation study trains/validates on varied scales).

    Opt-in realism knobs (all default OFF — the committed accuracy
    fixtures were trained on the default rendering and CI bounds depend
    on it staying byte-identical):
      clutter: expected count of non-cage hard negatives per tile — bright
        wave streaks (thin lines) and boat-like filled rectangles that a
        shape-only detector confuses with cages. No labels are emitted for
        them: they must be LEARNED as negatives.
      rotate: draw square cages at a random orientation (labels stay the
        axis-aligned bounds of the drawn shape, like real annotations).
      contrast_jitter: +-fraction applied per-tile to the cage outline
        brightness (turbidity/lighting variation across tiles).
    """
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "images")
    lab_dir = os.path.join(out_dir, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    for i in range(n_images):
        sea = rng.normal(70, 12, (size, size, 3)).clip(0, 255).astype(np.uint8)
        sea[..., 2] = np.clip(sea[..., 2].astype(int) + 40, 0, 255)  # blue-ish
        im = Image.fromarray(sea)
        draw = ImageDraw.Draw(im)
        outline = 235
        if contrast_jitter:
            outline = int(np.clip(235 * (1 + rng.uniform(-contrast_jitter,
                                                         contrast_jitter)),
                                  110, 255))
        if clutter:
            for _ in range(rng.poisson(clutter)):
                kind = rng.uniform()
                x0, y0 = rng.uniform(20, size - 120, 2)
                if kind < 0.6:  # wave streak: long thin bright line
                    ang = rng.uniform(0, np.pi)
                    ln = rng.uniform(120, 420)
                    x1, y1 = x0 + ln * np.cos(ang), y0 + ln * np.sin(ang)
                    c = int(rng.uniform(150, 220))
                    draw.line((x0, y0, x1, y1), fill=(c, c, c),
                              width=int(rng.integers(2, 5)))
                else:  # boat-like filled rectangle (hard negative vs cages)
                    w, h = rng.uniform(18, 60), rng.uniform(8, 22)
                    c = int(rng.uniform(170, 235))
                    draw.rectangle((x0, y0, x0 + w, y0 + h),
                                   fill=(c, c, min(255, c + 10)))
        rows = []
        # cluster of cages in one spot per tile
        ccx, ccy = rng.uniform(200, size - 200, 2)
        for _ in range(int(rng.integers(4, 9))):
            cx = np.clip(ccx + rng.normal(0, 80), 40, size - 40)
            cy = np.clip(ccy + rng.normal(0, 80), 40, size - 40)
            r = rng.uniform(*r_range)
            cls = int(rng.integers(0, 2))  # 0 circle, 1 square
            bb = (cx - r, cy - r, cx + r, cy + r)
            col = (outline, outline, max(0, outline - 5))
            bcx, bcy, bw, bh = cx, cy, 2 * r, 2 * r
            if cls == 0:
                draw.ellipse(bb, outline=col, width=6)
            elif rotate:
                theta = rng.uniform(0, np.pi / 2)
                c_, s_ = np.cos(theta), np.sin(theta)
                pts = [(cx + r * (c_ * dx - s_ * dy), cy + r * (s_ * dx + c_ * dy))
                       for dx, dy in ((-1, -1), (1, -1), (1, 1), (-1, 1))]
                pts.append(pts[0])
                draw.line(pts, fill=col, width=6, joint="curve")
                # line strokes are centered on the centerline (unlike
                # rectangle/ellipse outlines, which paint inward), so the
                # drawn pixels extend ~half the stroke beyond pts
                xs, ys = [p[0] for p in pts], [p[1] for p in pts]
                bcx, bcy = (min(xs) + max(xs)) / 2, (min(ys) + max(ys)) / 2
                bw = max(xs) - min(xs) + 6
                bh = max(ys) - min(ys) + 6
            else:
                draw.rectangle(bb, outline=col, width=6)
            rows.append(f"{cls} {bcx/size:.6f} {bcy/size:.6f} "
                        f"{bw/size:.6f} {bh/size:.6f}")
        name = f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0"
        im.save(os.path.join(img_dir, name + ".jpeg"), quality=92)
        with open(os.path.join(lab_dir, name + ".txt"), "w") as f:
            f.write("\n".join(rows) + "\n")

    with open(os.path.join(out_dir, "wanted_bboxes.csv"), "w") as f:
        f.write("geometry\n")
        for i in range(n_images):
            x = (i % 6) * 1200.0
            y = (i // 6) * 1200.0
            f.write(f'"POLYGON (({x} {y}, {x+1200} {y}, {x+1200} {y+1200}, {x} {y+1200}, {x} {y}))"\n')
    return img_dir, lab_dir


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/aq_demo")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--augment", action="store_true",
                    help="mosaic/affine/HSV — the generalizing recipe; pair "
                         "with --epochs 2400 (8x held-out mAP vs no-aug, "
                         "BENCHMARKS.md aug study)")
    args = ap.parse_args()

    import jax

    if os.environ.get("AQ_TPU") != "1":  # probing axon HANGS during a tunnel outage (CLAUDE.md); AQ_TPU=1 opts into the chip
        jax.config.update("jax_platforms", "cpu")

    from aquaculture_tpu.cli.detect import load_model
    from aquaculture_tpu.cli.geocode import load_download_bboxes
    from aquaculture_tpu.config import DetectConfig, TrainConfig
    from aquaculture_tpu.models.yolov5 import yolov5_init
    from aquaculture_tpu.pipeline import run_pipeline
    from aquaculture_tpu.post.cluster import predictions_cluster
    from aquaculture_tpu.train.dataset import DetectionDataset
    from aquaculture_tpu.train.trainer import init_train_state, make_train_step
    from aquaculture_tpu.utils.checkpoint import save_params
    from aquaculture_tpu.utils.logging import log_info

    img_dir, lab_dir = render_world(args.out)
    log_info("rendered synthetic world -> %s", args.out)

    # --- train ---
    # batch 4 -> 6 steps/epoch: the default 150 epochs = 900 steps. YOLO
    # objectness converges slowly (the obj BCE averages over all cells, so
    # the positive gradient is diluted ~1000x); short runs stay inside the
    # 100-step warmup and look untrained.
    # With --augment, scale jitter is moderated to 0.3: the world's cages
    # are 6-26 px at 160px and the ultralytics default +-50% shrinks them
    # below detectability (measured in BENCHMARKS.md "Augmentation study").
    cfg = TrainConfig(img_size=args.img, batch_size=4, epochs=args.epochs,
                      mosaic=0.5, scale=0.3 if args.augment else 0.5)
    ds = DetectionDataset(img_dir, lab_dir, cfg, augment=args.augment, seed=0)
    model, params = yolov5_init("n", num_classes=2, seed=0)
    state = init_train_state(model, params)
    import jax.numpy as jnp

    step_fn = jax.jit(make_train_step(model, cfg, ds.steps_per_epoch), donate_argnums=0)
    for epoch in range(cfg.epochs):
        last = {}
        for batch in ds.epoch(epoch):
            state, last = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if (epoch + 1) % 5 == 0:
            log_info("epoch %d: loss %.3f", epoch + 1, float(last["total"]))
    ckpt = os.path.join(args.out, "ckpt")
    save_params(ckpt, state.ema, metadata={"variant": "n", "num_classes": 2})

    # --- export to ultralytics .pt and serve from it (weights interop) ---
    # Models trained here flow back into the reference ecosystem
    # (models/export.py, torch-free writer); loading the export must serve
    # identically to the checkpoint dir.
    from aquaculture_tpu.cli.export import main as export_main

    pt_path = os.path.join(args.out, "demo_export.pt")
    export_main(["--ckpt", ckpt, "--out", pt_path, "--variant", "n", "--num-classes", "2"])

    # --- detect + geocode + areas (fused pipeline) ---
    model2, params2 = load_model(pt_path, "n", 2)
    dl = load_download_bboxes(os.path.join(args.out, "wanted_bboxes.csv"))
    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir) if f.endswith(".jpeg")
    )
    det, stats = run_pipeline(
        paths, model2, params2, dl, DetectConfig(img_size=args.img, conf_threshold=0.05),
        batch_size=8,
    )
    det.to_file(os.path.join(args.out, "detections.geojson"))
    log_info("%d tiles -> %d detections (%.1f tiles/s)", stats.tiles, len(det), stats.tiles_per_second)

    # --- mAP against the rendered labels (eval/accuracy harness) ---
    from aquaculture_tpu.eval.accuracy import world_map

    m = world_map(
        paths, lab_dir, model2, params2,
        DetectConfig(img_size=args.img, conf_threshold=0.001), num_classes=2,
    )
    log_info("mAP@.5 = %.3f, mAP@.5:.95 = %.3f", m["map50"], m["map"])

    # --- cluster into facilities ---
    if len(det):
        det["index"] = range(len(det))
        fac = predictions_cluster(
            det.to_crs(3035), "year", conf_thresh=0.05, distance_threshold=150.0, min_cluster_size=3
        )
        log_info("%d facilities", len(fac))

    # --- facility engine + depth + K=10,000 bootstrap + figures ---
    # The rest of the reference workflow (generate_facilities.py:20 ->
    # tonnage_estimates.py:323): AquaFacility with min/max dedup, depth
    # from a synthetic bathymetry raster, the tonnage bootstrap, the
    # Figure-6 style plot, and the facility map.
    if len(det):
        tonnage_stage(args.out, det, img_dir)
    log_info("demo artifacts in %s", args.out)


def tonnage_stage(out_dir: str, det, img_dir: str) -> None:
    import glob as _glob

    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.cli.facilities import main as facilities_main
    from aquaculture_tpu.data.geotiff import write_geotiff
    from aquaculture_tpu.geo import polygon as _poly
    from aquaculture_tpu.geo.crs import mercator_inverse
    from aquaculture_tpu.utils.logging import log_info

    os.makedirs(os.path.join(out_dir, "tonnage"), exist_ok=True)
    det_path = os.path.join(out_dir, "detections.geojson")

    # image boxes: one per rendered tile (year 2014, whitespace-free)
    n_tiles = len(_glob.glob(os.path.join(img_dir, "*.jpeg")))
    geoms, recs = [], {"bbox_ind": [], "x_offset": [], "y_offset": [], "year": [], "image_file": []}
    for i in range(n_tiles):
        x = (i % 6) * 1200.0
        y = (i // 6) * 1200.0
        geoms.append(_poly.box(x, y, x + 1200, y + 1200))
        recs["bbox_ind"].append(i)
        recs["x_offset"].append(0)
        recs["y_offset"].append(0)
        recs["year"].append(2014)
        recs["image_file"].append(f"ORTHOIMAGERY.ORTHOPHOTOS2014_{i}_0_0.jpeg")
    image_boxes = gf.GeoFrame(recs, geometry=geoms, crs=3857)
    ib_path = os.path.join(out_dir, "image_boxes.geojson")
    image_boxes.to_file(ib_path)

    # ground-truth cage labels -> humanlabels.geojson (pixel -> EPSG:3857,
    # with the meter-space box-edge columns the error-distribution fit
    # reads: xmin_m/xmax_m/ymin_m/ymax_m)
    lab_geoms = []
    lab_recs = {k: [] for k in ("image", "year", "type",
                                "xmin", "xmax", "ymin", "ymax",
                                "xmin_m", "xmax_m", "ymin_m", "ymax_m")}
    scale = 1200.0 / 1024.0
    for lp in sorted(_glob.glob(os.path.join(out_dir, "labels", "*.txt"))):
        stem = os.path.basename(lp)[:-4]
        i = int(stem.split("_")[1])
        x0, y0 = (i % 6) * 1200.0, (i // 6) * 1200.0
        rows = np.loadtxt(lp, ndmin=2)
        for cls, cx, cy, w, h in rows:
            cxm = x0 + cx * 1024 * scale
            cym = y0 + 1200.0 - cy * 1024 * scale  # pixel y runs down
            wm, hm = w * 1024 * scale, h * 1024 * scale
            lab_geoms.append(_poly.box(cxm - wm / 2, cym - hm / 2, cxm + wm / 2, cym + hm / 2))
            lab_recs["image"].append(stem + ".jpeg")
            lab_recs["year"].append(2014)
            lab_recs["type"].append("circle_cage" if int(cls) == 0 else "square_cage")
            lab_recs["xmin_m"].append(cxm - wm / 2)
            lab_recs["xmax_m"].append(cxm + wm / 2)
            lab_recs["ymin_m"].append(cym - hm / 2)
            lab_recs["ymax_m"].append(cym + hm / 2)
            lab_recs["xmin"].append(int((cx - w / 2) * 1024))
            lab_recs["xmax"].append(int((cx + w / 2) * 1024))
            lab_recs["ymin"].append(int((cy - h / 2) * 1024))
            lab_recs["ymax"].append(int((cy + h / 2) * 1024))
    labels = gf.GeoFrame(lab_recs, geometry=lab_geoms, crs=3857)
    labels_path = os.path.join(out_dir, "humanlabels.geojson")
    labels.to_file(labels_path)

    # synthetic bathymetry GeoTIFF (EPSG:4326 like the EMOD tiles)
    lon0, lat0 = mercator_inverse(np.array([-100.0]), np.array([-100.0]))
    lon1, lat1 = mercator_inverse(np.array([7400.0]), np.array([5000.0]))
    rng = np.random.default_rng(0)
    depth = (-20.0 + rng.normal(0, 3.0, (64, 64))).astype(np.float32)
    bathy_path = os.path.join(out_dir, "bathymetry.tif")
    write_geotiff(
        bathy_path, depth,
        (float(lon0[0]), float(lat0[0]), float(lon1[0]), float(lat1[0])), epsg=4326,
    )

    # facility construction CLI (generate_facilities.py equivalent)
    fac_pkl = os.path.join(out_dir, "facilities.pkl")
    facilities_main([
        "--detections", det_path, "--image-boxes", ib_path, "--out", fac_pkl,
        "--bathymetry", bathy_path,
        "--conf", "0.2", "--distance", "150", "--min-size", "3",
    ])

    # tonnage CLI (tonnage_estimates.py equivalent) — needs the real
    # production-factor workbook + FAO CSV from the reference checkout
    ref_data = "/root/reference/data"
    if os.path.isdir(ref_data):
        from aquaculture_tpu.cli.tonnage import main as tonnage_main

        tonnage_main([
            "--facility", fac_pkl,
            "--labels", labels_path,
            "--detections", det_path,
            "--download-bboxes", os.path.join(out_dir, "wanted_bboxes.csv"),
            "--prod-factors", os.path.join(ref_data, "Production Estimation Factors.xlsx"),
            "--fao", os.path.join(ref_data, "French_med_production_fao.csv"),
            "--out", os.path.join(out_dir, "tonnage", "estimates.csv"),
            "--plot", os.path.join(out_dir, "tonnage", "tonnage_figure.png"),
            "--conf", "0.2",
        ])
    else:
        log_info("reference data dir absent; skipping tonnage bootstrap stage")

    # facility map (FacilitiesMaps.py equivalent)
    from aquaculture_tpu.results.maps import facility_map_html
    from aquaculture_tpu.tonnage.facility import load_AquaFacility

    fac_obj = load_AquaFacility(fac_pkl)
    facility_map_html(
        fac_obj.final_facilities, os.path.join(out_dir, "facility_map.html"), group_col="pass"
    )
    log_info(
        "facility engine: %d facilities, depth attached, map + tonnage written",
        len(fac_obj.final_facilities),
    )


if __name__ == "__main__":
    main()
