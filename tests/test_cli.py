"""CLI smoke tests for the staged script surface (no detector involved:
label files -> geocode -> areas -> cluster -> facilities chain)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def world(tmp_path):
    """Synthetic label world: one download box, two tiles, clustered cages."""
    labels = tmp_path / "labels"
    labels.mkdir()
    # 6 clustered cages on one tile + 1 isolated on another
    rows = []
    for i in range(6):
        cx = (100 + 14 * i) / 1024
        rows.append(f"0 {cx:.6f} 0.5 0.01 0.01 0.9")
    (labels / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.txt").write_text("\n".join(rows) + "\n")
    (labels / "ORTHOIMAGERY.ORTHOPHOTOS2014_0_1024_0.txt").write_text("1 0.5 0.5 0.01 0.01 0.95\n")
    bboxes = tmp_path / "wanted_bboxes.csv"
    bboxes.write_text('geometry\n"POLYGON ((0 0, 1200 0, 1200 1200, 0 1200, 0 0))"\n')
    return tmp_path


def test_geocode_areas_cluster_chain(world):
    from aquaculture_tpu.cli.areas import main as areas_main
    from aquaculture_tpu.cli.cluster import main as cluster_main
    from aquaculture_tpu.cli.geocode import main as geocode_main

    det_path = str(world / "detections.geojson")
    geocode_main(
        [
            "--labels", str(world / "labels"),
            "--download-bboxes", str(world / "wanted_bboxes.csv"),
            "--out", det_path,
        ]
    )
    fc = json.load(open(det_path))
    assert len(fc["features"]) == 7
    props = fc["features"][0]["properties"]
    for c in ("image", "xmin_m", "type", "year", "det_conf"):
        assert c in props

    areas_main(["--detections", det_path])
    fc = json.load(open(det_path))
    assert "area" in fc["features"][0]["properties"]
    assert fc["features"][0]["properties"]["area"] > 0

    fac_path = str(world / "facilities.geojson")
    cluster_main(
        ["--detections", det_path, "--out", fac_path,
         "--conf", "0.5", "--distance", "50", "--min-size", "5"]
    )
    fc = json.load(open(fac_path))
    assert len(fc["features"]) == 1  # the 6-cage cluster; isolated cage is noise
    p = fc["features"][0]["properties"]
    assert p["num_circle_farms"] == 6
    assert p["area"] > 0


def test_facilities_cli(world, tmp_path):
    from aquaculture_tpu.cli.facilities import main as facilities_main
    from aquaculture_tpu.cli.geocode import main as geocode_main
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo import polygon as _poly

    det_path = str(world / "detections.geojson")
    geocode_main(
        ["--labels", str(world / "labels"),
         "--download-bboxes", str(world / "wanted_bboxes.csv"),
         "--out", det_path]
    )
    from aquaculture_tpu.cli.areas import main as areas_main

    areas_main(["--detections", det_path])

    boxes_path = str(world / "image_boxes.geojson")
    boxes = gf.GeoFrame(
        {"bbox_ind": [0, 0], "x_offset": [0, 1024], "y_offset": [0, 0],
         "year": [2014, 2014], "image_file": ["a", "b"]},
        geometry=[_poly.box(0, 1000, 200, 1200), _poly.box(200, 1000, 400, 1200)],
        crs=3857,
    )
    boxes.to_file(boxes_path)

    out_pkl = str(world / "fac.pkl")
    facilities_main(
        ["--detections", det_path, "--image-boxes", boxes_path, "--out", out_pkl,
         "--conf", "0.5", "--distance", "50", "--min-size", "5", "--no-min-max"]
    )
    import pickle

    with open(out_pkl, "rb") as f:
        fac = pickle.load(f)
    assert len(fac.final_facilities) == 1


def test_figures_cli(world, tmp_path):
    import json

    from aquaculture_tpu.cli.figures import main as figures_main
    from aquaculture_tpu.cli.geocode import main as geocode_main
    from aquaculture_tpu import frame as gf
    from aquaculture_tpu.geo import polygon as _poly

    det_path = str(world / "detections.geojson")
    geocode_main(
        ["--labels", str(world / "labels"),
         "--download-bboxes", str(world / "wanted_bboxes.csv"),
         "--out", det_path]
    )
    # labels = detections sans det_conf
    det = gf.read_file(det_path)
    lab = det.drop(columns=["det_conf"]).copy()
    lab.crs = det.crs
    lab_path = str(world / "labels.geojson")
    lab.to_file(lab_path)
    # facilities + trujillo for the map branch
    fac = gf.GeoFrame(
        {"pass": ["2013-2015"]},
        geometry=[_poly.Point(100.0, 1100.0)],
        crs=3857,
    )
    fac_path = str(world / "fac.geojson")
    fac.to_file(fac_path)
    tru_path = str(world / "trujillo.csv")
    with open(tru_path, "w") as f:
        f.write("lon,lat\n0.001,0.009\n")

    out_dir = str(world / "figs")
    figures_main(
        ["--detections", det_path, "--labels", lab_path,
         "--facilities", fac_path, "--trujillo", tru_path,
         "--out-dir", out_dir, "--distance", "50", "--min-size", "5"]
    )
    import os

    files = os.listdir(out_dir)
    assert "performance_across_confidence.pdf" in files
    assert any(f.startswith("facility_map_") for f in files)


def test_plan_cli(capsys):
    """aq-plan prints the measured recommendation; --json is parseable."""
    import json as _json

    from aquaculture_tpu.cli.plan import main as plan_main

    plan_main(["--json"])
    rec = _json.loads(capsys.readouterr().out.strip())
    assert rec["variant"] == "mt" and rec["batch"] == 128 and not rec["int8"]

    plan_main(["--pt-interop"])
    out = capsys.readouterr().out
    assert "variant=m " in out and "int8=True" in out

    # the measured TTA rule: off by default (in-distribution loss), on
    # under scale mismatch (BENCHMARKS TTA scale-shift study)
    assert rec["tta"] is False
    plan_main(["--scale-shifted", "--json"])
    rec2 = _json.loads(capsys.readouterr().out.strip())
    assert rec2["tta"] is True

    # pinning mt while requiring .pt interop is an impossibility, not a
    # trade-off: no ultralytics .pt exists for the framework-own map
    import pytest

    from aquaculture_tpu.models.plan import recommend_serving

    with pytest.raises(ValueError, match="pt_interop"):
        recommend_serving(variant="mt", pt_interop=True)

    # the training plan: measured defaults, remat only under memory pressure
    plan_main(["--train", "--json"])
    tr = _json.loads(capsys.readouterr().out.strip())
    assert tr["variant"] == "mt" and tr["batch"] == 128
    assert tr["compute_dtype"] == "bfloat16" and tr["remat"] is False
    plan_main(["--train", "--memory-constrained", "--small-targets", "--json"])
    tr2 = _json.loads(capsys.readouterr().out.strip())
    assert tr2["remat"] is True and tr2["scale_jitter"] == 0.3

    from aquaculture_tpu.models.plan import recommend_training

    with pytest.raises(ValueError, match="pt_interop"):
        recommend_training(variant="mt", pt_interop=True)


def test_detect_aot_decode_scale_rejected(tmp_path):
    """--decode-scale batches arrive at img px; a fixed-shape AOT program
    compiled for raw tiles cannot retrace — reject the combination upfront
    instead of dying mid-stream with an XLA shape error."""
    import pytest

    from aquaculture_tpu.cli.detect import main as detect_main

    with pytest.raises(SystemExit, match="decode-scale"):
        detect_main([
            "--source", str(tmp_path), "--out", str(tmp_path / "o"),
            "--aot", str(tmp_path / "missing.aqx"), "--decode-scale",
        ])


def test_resolve_model_args_metadata_and_contradictions(tmp_path):
    """Round-4c: detect/pipeline/pod/train default variant/num_classes from
    the checkpoint's saved metadata (cli/export already did); an explicit
    flag contradicting it errors instead of building the wrong tree."""
    import numpy as np
    import pytest

    from aquaculture_tpu.cli.detect import resolve_model_args
    from aquaculture_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "ck")
    save_params(ckpt, {"x": np.zeros(1)},
                metadata={"variant": "n6", "num_classes": 3})

    assert resolve_model_args(ckpt, None, None) == ("n6", 3)
    assert resolve_model_args(ckpt, "n6", 3) == ("n6", 3)
    assert resolve_model_args(None, None, None) == ("m", 5)
    assert resolve_model_args("w.pt", None, 2) == ("m", 2)
    with pytest.raises(SystemExit):
        resolve_model_args(ckpt, "m", None)
    with pytest.raises(SystemExit):
        resolve_model_args(ckpt, None, 5)
