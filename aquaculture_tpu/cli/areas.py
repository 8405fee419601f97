"""Area CLI: append cage surface-area columns to detections.geojson.

Equivalent of the reference's calc_net_areas.py __main__
(reference: src/process_yolo/calc_net_areas.py:154-175).
"""

from __future__ import annotations

import argparse

from aquaculture_tpu import frame as gf
from aquaculture_tpu.post.areas import cage_areas
from aquaculture_tpu.utils.logging import log_info


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detections", required=True, help="detections.geojson path (updated in place)")
    ap.add_argument("--out", default=None, help="optional separate output path")
    args = ap.parse_args(argv)

    det = gf.read_file(args.detections)
    det = cage_areas(det)
    det.to_file(args.out or args.detections)
    log_info("wrote areas for %d detections -> %s", len(det), args.out or args.detections)


if __name__ == "__main__":
    main()
