"""Serving-accuracy A/B: mAP-bound every serving option against bf16.

Drives eval/accuracy.serving_accuracy_table on the rendered demo world with
a trained checkpoint (scripts/train_demo_ckpt.py) and prints one JSON line
per serving configuration. Results feed the BENCHMARKS.md accuracy table;
any default whose mAP regresses past tolerance gets demoted.

    python scripts/train_demo_ckpt.py --out /tmp/aq_acc
    python scripts/accuracy_ab.py --world /tmp/aq_acc --ckpt /tmp/aq_acc/ckpt
"""


import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--world", required=True, help="demo world dir (images/ labels/)")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--variant", default="n")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--configs", default=None, help="comma list (default: all)")
    ap.add_argument("--out", default=None, help="append JSONL here too")
    ap.add_argument("--ckpt-tag", default=None,
                    help="provenance tag recorded as 'ckpt' in each row "
                         "(the committed-row CI tests filter on it)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the tunneled TPU (default forces CPU — "
                         "probing the axon backend hangs during an outage)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from aquaculture_tpu.eval.accuracy import SERVING_CONFIGS, serving_accuracy_table

    configs = args.configs.split(",") if args.configs else SERVING_CONFIGS
    rows = serving_accuracy_table(
        os.path.join(args.world, "images"),
        os.path.join(args.world, "labels"),
        args.ckpt,
        variant=args.variant,
        num_classes=args.num_classes,
        img_size=args.img,
        configs=configs,
    )
    base = next((r for r in rows if r.name == "bf16"), rows[0])
    lines = []
    for r in rows:
        rec = {
            "config": r.name,
            # VERDICT r3 #2: bounds must name the config they protect
            "variant": args.variant,
            "img": args.img,
            "map50": round(r.map50, 4),
            "map50_95": round(r.map, 4),
            "d_map50_vs_bf16": round(r.map50 - base.map50, 4),
        }
        if args.ckpt_tag:
            rec["ckpt"] = args.ckpt_tag
        line = json.dumps(rec)
        print(line, flush=True)
        lines.append(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
