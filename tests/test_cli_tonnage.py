"""Tonnage CLI smoke test: facility pickle -> per-period estimates CSV,
using the REAL production-factor workbook and FAO data as fixtures."""

import numpy as np
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.tonnage.facility import AquaFacility
from aquaculture_tpu.tonnage.periods import map_year_to_image_pass


@pytest.fixture
def world(tmp_path):
    recs = {k: [] for k in ("image", "year", "det_conf", "type", "area", "area_var",
                            "min_area", "max_area", "xmin", "xmax", "ymin", "ymax",
                            "xmin_m", "xmax_m", "ymin_m", "ymax_m")}
    geoms = []
    for year, x0 in ((2013, 100.0), (2017, 5000.0)):
        for i in range(6):
            x = x0 + 14 * i
            geoms.append(_poly.box(x, 100, x + 10, 110))
            recs["image"].append(f"ORTHOIMAGERY.ORTHOPHOTOS{year}_0_0_0.jpeg")
            recs["year"].append(year)
            recs["det_conf"].append(0.9)
            recs["type"].append("circle_farm")
            recs["area"].append(78.5)
            recs["area_var"].append(0.0)
            recs["min_area"].append(78.5)
            recs["max_area"].append(78.5)
            recs["xmin"].append(100); recs["xmax"].append(200)
            recs["ymin"].append(100); recs["ymax"].append(200)
            recs["xmin_m"].append(x); recs["xmax_m"].append(x + 10)
            recs["ymin_m"].append(100.0); recs["ymax_m"].append(110.0)
    dets = gf.GeoFrame(recs, geometry=geoms, crs=3857)
    dets.to_file(str(tmp_path / "ocean_detections.geojson"))
    labels = dets.copy()
    labels.crs = 3857
    labels["type"] = "circle_cage"
    labels.to_file(str(tmp_path / "humanlabels.geojson"))
    (tmp_path / "wanted_bboxes.csv").write_text(
        'geometry\n"POLYGON ((0 0, 6000 0, 6000 1200, 0 1200, 0 0))"\n'
    )
    boxes = gf.GeoFrame(
        {"bbox_ind": [0, 0], "x_offset": [0, 0], "y_offset": [0, 0],
         "year": [2013, 2017], "image_file": ["a", "b"]},
        geometry=[_poly.box(0, 0, 6000, 1200)] * 2,
        crs=3857,
    )
    fac = AquaFacility(dets, boxes, map_year_to_image_pass, min_cluster_size=5)
    fac.final_facilities["cage_depth"] = 12.0
    fac.save(str(tmp_path / "fac.pkl"))
    # Trujillo point at the 2013 cluster (3857 -> lon/lat), for the
    # comparison path (reference aquaculture_med_dedupe.csv shape)
    from aquaculture_tpu.geo import crs as _crs

    lon, lat = _crs.transform(3857, 4326, 150.0, 105.0)
    (tmp_path / "trujillo.csv").write_text(f"lon,lat\n{float(lon)},{float(lat)}\n")
    return tmp_path


def test_tonnage_cli_end_to_end(world, reference_data_dir):
    import pandas as pd

    from aquaculture_tpu.cli.tonnage import main

    out = str(world / "tonnage.csv")
    main(
        [
            "--facility", str(world / "fac.pkl"),
            "--labels", str(world / "humanlabels.geojson"),
            "--detections", str(world / "ocean_detections.geojson"),
            "--download-bboxes", str(world / "wanted_bboxes.csv"),
            "--prod-factors", str(reference_data_dir / "Production Estimation Factors.xlsx"),
            "--fao", str(reference_data_dir / "French_med_production_fao.csv"),
            "--out", out,
            "--plot", str(world / "fig6.pdf"),
            "--K", "500",
            "--trujillo", str(world / "trujillo.csv"),
        ]
    )
    est = pd.read_csv(out, index_col=0)
    assert set(est.index) == {"2013-2015", "2016-2018"}
    assert (est["tonnage"] > 0).all()
    assert (est["tonnage_sd"] > 0).all()
    assert (world / "fig6.pdf").exists()
