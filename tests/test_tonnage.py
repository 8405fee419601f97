"""Tonnage-engine tests: factor tables vs the real reference workbook/CSVs,
bootstrap statistics vs scipy oracles, dedup permutation semantics,
zonal-stats depth, AquaFacility end-to-end."""

import numpy as np
import pandas as pd
import pytest

from aquaculture_tpu import frame as gf
from aquaculture_tpu.geo import polygon as _poly
from aquaculture_tpu.tonnage.bootstrap import (
    BootstrapInputs,
    compute_facility_tonnage_estimates,
    prepare_bootstrap_inputs,
    run_bootstrap,
)
from aquaculture_tpu.tonnage.dedup_years import dedup_cages_in_overlap_years_with_white_space
from aquaculture_tpu.tonnage.depth import add_facility_depth
from aquaculture_tpu.tonnage.errors import (
    compute_cage_area_estimates_gdf,
    get_cage_area_errors_from_labels,
)
from aquaculture_tpu.tonnage.factors import (
    factor_columns_for_bootstrap,
    generate_period_production_factors,
    load_fao_french_mediterranean,
    load_production_factors,
)
from aquaculture_tpu.tonnage.periods import map_year_to_image_pass


# ------------------------------------------------------------------ periods


def test_year_pass_map():
    assert map_year_to_image_pass(2000) == "2000-2004"
    assert map_year_to_image_pass(2009) == "2005-2009"
    assert map_year_to_image_pass(2021) == "2019-2021"
    assert map_year_to_image_pass(1999) == "No group"


# ------------------------------------------------------------------ factors


def test_load_production_factors_real_workbook(reference_data_dir):
    path = reference_data_dir / "Production Estimation Factors.xlsx"
    table = load_production_factors(str(path))
    assert set(table["Parameter"]) == {"Stocking density", "Annual harvest frequency"}
    seabass_sd = table[(table["Species"] == "seabass") & (table["Parameter"] == "Stocking density")]
    assert float(seabass_sd["Factor"].iloc[0]) == 20.0
    # harvest frequency converted months -> annual
    seabass_hf = table[
        (table["Species"] == "seabass") & (table["Parameter"] == "Annual harvest frequency")
    ]
    assert float(seabass_hf["Factor"].iloc[0]) == pytest.approx(12.0 / 20.0)
    # uniform-range sd
    assert float(seabass_sd["Standard deviation"].iloc[0]) == pytest.approx(
        np.sqrt((20.0 - 5.0) ** 2 / 12)
    )


def test_fao_and_period_factors_real_data(reference_data_dir):
    fao = load_fao_french_mediterranean(
        str(reference_data_dir / "French_med_production_fao.csv"), map_year_to_image_pass
    )
    assert set(fao["species_group"]) <= {"seabass", "seabream", "meagre"}
    assert fao["year"].min() >= 2000
    # annual shares sum to 1 for years with production
    shares = fao.groupby("year")["production_share"].sum()
    nz = shares[shares > 0]
    assert np.allclose(nz.to_numpy(), 1.0)

    table = load_production_factors(str(reference_data_dir / "Production Estimation Factors.xlsx"))
    period = generate_period_production_factors(table, fao, "pass")
    assert "Factor Stocking density" in period.columns
    assert "Standard deviation Annual harvest frequency" in period.columns
    assert len(period) == fao["pass"].nunique()
    sb = factor_columns_for_bootstrap(period)
    for c in ("s_mean", "s_sd", "h_mean", "h_sd"):
        assert c in sb.columns
        assert np.isfinite(sb[c].to_numpy(np.float64)).all()
    # stocking densities must be inside the sampling bounds
    assert (sb["s_mean"] > 5).all() and (sb["s_mean"] < 20).all()


# ------------------------------------------------------------------ errors


def test_cage_area_errors_best_overlap_match():
    # one detection overlapping two labels; the higher-overlap label wins
    det = gf.GeoFrame(
        {"year": [2014], "area": [50.0]},
        geometry=[_poly.box(0, 0, 10, 10)],
        crs=3035,
    )
    labels = gf.GeoFrame(
        {"year": [2014, 2014], "area": [80.0, 200.0]},
        geometry=[_poly.box(0, 0, 9, 10), _poly.box(8, 0, 12, 10)],
        crs=3035,
    )
    errors = get_cage_area_errors_from_labels(det, labels)
    assert len(errors) == 1
    assert float(errors.iloc[0]) == pytest.approx(80.0 - 50.0)


def test_cage_area_errors_year_mismatch_dropped():
    det = gf.GeoFrame({"year": [2014], "area": [50.0]}, geometry=[_poly.box(0, 0, 10, 10)], crs=3035)
    labels = gf.GeoFrame({"year": [2016], "area": [80.0]}, geometry=[_poly.box(0, 0, 10, 10)], crs=3035)
    errors = get_cage_area_errors_from_labels(det, labels)
    assert len(errors) == 0


def test_compute_cage_area_estimates_gdf():
    lab = gf.GeoFrame(
        {
            "xmin": [10], "xmax": [60], "ymin": [10], "ymax": [60],
            "xmin_m": [0.0], "xmax_m": [10.0], "ymin_m": [0.0], "ymax_m": [10.0],
            "type": ["circle_cage"],
        },
        geometry=[_poly.box(0, 0, 10, 10)],
        crs=3035,
    )
    out = compute_cage_area_estimates_gdf(lab)
    assert float(out["area"].iloc[0]) == pytest.approx(np.pi * 25)


# ------------------------------------------------------------------ bootstrap


def _simple_inputs():
    # one facility, one circle cage (full ellipse), one period
    return BootstrapInputs(
        cage_fac=np.asarray([0], np.int32),
        area_orig=np.asarray([100.0]),
        var_zero_circle=np.asarray([True]),
        is_circle=np.asarray([True]),
        err_mean=np.asarray([0.0]),
        err_sd=np.asarray([0.0]),
        in_min=np.asarray([True]),
        in_max=np.asarray([True]),
        in_random=np.asarray([True]),
        fac_period=np.asarray([0], np.int32),
        cage_depth=np.asarray([10.0]),
        s_mean=np.asarray([12.0]),
        s_sd=np.asarray([0.0]),
        h_mean=np.asarray([0.6]),
        h_sd=np.asarray([0.0]),
        periods=["2013-2015"],
    )


def test_bootstrap_degenerate_distributions_give_closed_form():
    # All sds zero and min==max area: tonnage = area * depth * s * h / 1000
    # with depth ~ mixture of TNs that both collapse toward cage_depth when
    # sd>0... here depth sds are (10-5)/1.96 and 10/1.96 so depth varies;
    # fix mixture to dA with p=1 and check tonnage within dA's support.
    inp = _simple_inputs()
    est = run_bootstrap(inp, seed=0, K=4000, min_cage_threshold=5.0, depth_dist_mixture_param=1.0)
    t = float(est["tonnage"].iloc[0])
    # depth in [5, 10] => tonnage in [100*5*12*0.6/1000, 100*10*12*0.6/1000]
    assert 3.6 <= t <= 7.2
    assert float(est["tonnage_var"].iloc[0]) > 0


def test_bootstrap_truncnorm_depth_matches_scipy_mean():
    from scipy.stats import truncnorm

    inp = _simple_inputs()
    # mixture p=0 -> always dB: TN centered at c=10, sd=c/1.96, on [10, 2c]
    est = run_bootstrap(inp, seed=1, K=20000, min_cage_threshold=5.0, depth_dist_mixture_param=0.0)
    c = 10.0
    sd = c / 1.96
    expected_depth = truncnorm.mean(a=0, b=1.96, loc=c, scale=sd)
    expected_t = 100.0 * expected_depth * 12.0 * 0.6 / 1000.0
    assert float(est["tonnage"].iloc[0]) == pytest.approx(expected_t, rel=0.02)


def test_bootstrap_positive_area_guarantee():
    # error distribution with huge negative mean: truncation must keep
    # area > 0 (the reference's resample-until-positive loop)
    inp = _simple_inputs()
    inp.var_zero_circle[:] = True
    inp.err_mean[:] = -200.0
    inp.err_sd[:] = 50.0
    est = run_bootstrap(inp, seed=2, K=5000, min_cage_threshold=5.0, depth_dist_mixture_param=0.5)
    assert float(est["tonnage"].iloc[0]) > 0


def test_compute_facility_tonnage_estimates_frame_api():
    fac = pd.DataFrame(
        {
            "facility_index": [0, 1],
            "pass": ["2013-2015", "2016-2018"],
            "cage_ids": [[0, 1], [2]],
            "cage_ids_min": [[0], [2]],
            "cage_ids_max": [[0, 1], [2]],
            "cage_depth": [10.0, 8.0],
        }
    )
    preds = pd.DataFrame(
        {
            "index": [0, 1, 2],
            "type": ["circle_farm", "square_farm", "circle_farm"],
            "farm_type": ["circle_farm", "square_farm", "circle_farm"],
            "pass": ["2013-2015", "2013-2015", "2016-2018"],
            "area": [100.0, 50.0, 80.0],
            "area_var": [0.0, 10.0, 0.0],
            "min_area": [100.0, 25.0, 80.0],
            "max_area": [100.0, 50.0, 80.0],
        }
    )
    errs = pd.DataFrame(
        {
            "pass": ["2013-2015", "2013-2015", "2016-2018"],
            "farm_type": ["circle_farm", "square_farm", "circle_farm"],
            "model_error_mean": [0.0, 0.0, 5.0],
            "model_error_sd": [5.0, 5.0, 10.0],
        }
    )
    pft = pd.DataFrame(
        {
            "pass": ["2013-2015", "2016-2018"],
            "Factor Stocking density": [12.0, 13.0],
            "Standard deviation Stocking density": [1.0, 1.0],
            "Factor Annual harvest frequency": [0.6, 0.65],
            "Standard deviation Annual harvest frequency": [0.05, 0.05],
        }
    )
    est = compute_facility_tonnage_estimates(
        facility_df=fac,
        period_factor_table=pft,
        period_var="pass",
        min_cage_threshold=5.0,
        preds_df=preds,
        model_error_distributions=errs,
        depth_dist_mixture_param=0.8,
        K=2000,
        seed=0,
    )
    assert list(est.index) == ["2013-2015", "2016-2018"]
    assert (est["tonnage"] > 0).all()
    assert (est["tonnage_sd"] > 0).all()


# ------------------------------------------------------------------ depth


def test_add_facility_depth_zonal():
    from aquaculture_tpu.data.geotiff import GeoTiff

    # 10x10 bathymetry raster covering lon/lat [0,10]x[0,10], depth -20 west
    # half, -40 east half
    arr = np.full((10, 10), -20.0)
    arr[:, 5:] = -40.0
    bt = GeoTiff(array=arr, origin_x=0.0, origin_y=10.0, pixel_w=1.0, pixel_h=1.0, epsg=4326)

    fac = gf.GeoFrame(
        {
            "facility_index": [0],
            "circle_farm_geoms": [_poly.box(1.0, 1.0, 3.0, 3.0)],
            "square_farm_geoms": [_poly.Empty()],
        },
        geometry=[_poly.Point(2.0, 2.0)],
        crs=4326,
    )
    out = add_facility_depth(
        fac, bathymetry=bt, min_cage_threshold=5.0, default_cage_depth=10.0,
        bathymetry_statistic="bathy_min",
    )
    # cages over the west half: depth 20, cage_depth = 20/2 = 10
    assert float(out["bathy_min"].iloc[0]) == pytest.approx(20.0)
    assert float(out["cage_depth"].iloc[0]) == pytest.approx(10.0)


def test_add_facility_depth_default_when_missing():
    from aquaculture_tpu.data.geotiff import GeoTiff

    arr = np.full((4, 4), np.nan)
    bt = GeoTiff(array=arr, origin_x=0.0, origin_y=4.0, pixel_w=1.0, pixel_h=1.0, epsg=4326)
    fac = gf.GeoFrame(
        {
            "facility_index": [0],
            "circle_farm_geoms": [_poly.box(1.0, 1.0, 2.0, 2.0)],
            "square_farm_geoms": [_poly.Empty()],
        },
        geometry=[_poly.Point(1.5, 1.5)],
        crs=4326,
    )
    out = add_facility_depth(
        fac, bathymetry=bt, min_cage_threshold=5.0, default_cage_depth=12.0,
        bathymetry_statistic="bathy_min",
    )
    assert float(out["cage_depth"].iloc[0]) == 12.0


# ------------------------------------------------------------------ year dedup


def _year_dedup_fixture():
    """Two years in one pass covering the same tile; one extra unique tile."""
    boxes = gf.GeoFrame(
        {
            "bbox_ind": [0, 0, 1],
            "x_offset": [0, 0, 0],
            "y_offset": [0, 0, 0],
            "year": [2013, 2014, 2013],
            "image_file": ["a", "b", "c"],
        },
        geometry=[
            _poly.box(0, 0, 100, 100),      # 2013 covers whole tile
            _poly.box(0, 0, 100, 100),      # 2014 covers whole tile too
            _poly.box(200, 0, 300, 100),    # separate tile, one year
        ],
        crs=3857,
    )
    cages = gf.GeoFrame(
        {
            "image": [
                "ORTHOIMAGERY.ORTHOPHOTOS2013_0_0_0.jpeg",
                "ORTHOIMAGERY.ORTHOPHOTOS2014_0_0_0.jpeg",
                "ORTHOIMAGERY.ORTHOPHOTOS2013_1_0_0.jpeg",
            ],
            "year": [2013, 2014, 2013],
            "area": [10.0, 30.0, 7.0],
            "index": [0, 1, 2],
        },
        geometry=[
            _poly.box(10, 10, 20, 20),
            _poly.box(50, 50, 60, 60),
            _poly.box(210, 10, 220, 20),
        ],
        crs=3857,
    )
    return cages, boxes


def test_year_dedup_min_max_selection():
    cages, boxes = _year_dedup_fixture()
    # full overlap: first box in the permutation takes the whole tile.
    # min selection -> keep the 2013 image (cage area 10); max -> 2014 (30).
    dd_min, cov_min = dedup_cages_in_overlap_years_with_white_space(
        cages, boxes, map_year_to_image_pass, "min"
    )
    dd_max, _ = dedup_cages_in_overlap_years_with_white_space(
        cages, boxes, map_year_to_image_pass, "max"
    )
    # unique tile cage (index 2) always survives
    assert 2 in dd_min["index"].tolist() and 2 in dd_max["index"].tolist()
    assert dd_min[dd_min["index"] != 2]["area"].sum() == 10.0
    assert dd_max[dd_max["index"] != 2]["area"].sum() == 30.0
    # coverage is disjoint per pass
    cov = cov_min["2013-2015"]
    total = sum(g.area for g in cov["geometry"])
    assert total == pytest.approx(100 * 100 + 100 * 100)  # two tiles


def test_year_dedup_partial_whitespace():
    cages, boxes = _year_dedup_fixture()
    # 2014's image has whitespace: only covers the left half of the tile
    boxes = boxes.copy()
    geoms = list(boxes["geometry"])
    geoms[1] = _poly.box(0, 0, 50, 100)
    boxes["geometry"] = geoms
    boxes.crs = 3857
    dd_max, cov = dedup_cages_in_overlap_years_with_white_space(
        cages, boxes, map_year_to_image_pass, "max"
    )
    # Survival uses the reference's boundary-INCLUSIVE intersects
    # (shapely semantics, utils_tonnage.py:790-814): a zero-area boundary
    # touch keeps the cage. Permutations: if 2013 first, 2013 takes the
    # whole tile -> cage 0 kept (10), cage 1's 2014 region empty -> total
    # 10. If 2014 first, 2014 takes the left half [0,50]; cage 1 at x=50-60
    # TOUCHES it at x=50 -> kept (30); 2013 gets the right half -> cage 0
    # at x=10-20 outside -> total 30. max selection picks 30.
    assert dd_max[dd_max["index"] != 2]["area"].sum() == 30.0
    # coverage stays disjoint and total = tile area
    total = sum(g.area for g in cov["2013-2015"][cov["2013-2015"]["image_box_index"] != 2]["geometry"])
    assert total <= 100 * 100 + 1e-6


# ------------------------------------------------------------------ facility


def _facility_fixture():
    """Predictions + image boxes forming one clusterable facility."""
    n = 6
    geoms = []
    recs = {"image": [], "year": [], "det_conf": [], "type": [], "area": [],
            "area_var": [], "min_area": [], "max_area": []}
    for i in range(n):
        x = 10.0 + 12.0 * i
        geoms.append(_poly.box(x, 10.0, x + 8.0, 18.0))
        recs["image"].append("ORTHOIMAGERY.ORTHOPHOTOS2013_0_0_0.jpeg")
        recs["year"].append(2013)
        recs["det_conf"].append(0.9)
        recs["type"].append("circle_farm")
        recs["area"].append(50.0)
        recs["area_var"].append(0.0)
        recs["min_area"].append(50.0)
        recs["max_area"].append(50.0)
    preds = gf.GeoFrame(recs, geometry=geoms, crs=3857)
    boxes = gf.GeoFrame(
        {"bbox_ind": [0], "x_offset": [0], "y_offset": [0], "year": [2013],
         "image_file": ["a"]},
        geometry=[_poly.box(0, 0, 1200, 1200)],
        crs=3857,
    )
    return preds, boxes


def test_aquafacility_end_to_end():
    from aquaculture_tpu.data.geotiff import GeoTiff
    from aquaculture_tpu.tonnage.facility import (
        AquaFacility,
        compute_complete_period_tonnage_estimates,
    )

    preds, boxes = _facility_fixture()
    fac = AquaFacility(
        preds=preds,
        image_boxes=boxes,
        selected_map=map_year_to_image_pass,
        image_selection="random",
        confidence_threshold=0.785,
        distance_threshold=50.0,
        min_cluster_size=5,
        time_group="pass",
    )
    assert len(fac.final_facilities) == 1
    assert fac.final_facilities.crs == 3857
    assert "2013-2015" in fac.annual_coverage

    fac.compute_min_max_cages()
    assert "cage_ids_min" in fac.final_facilities.columns
    assert len(fac.final_facilities["cage_ids_min"].iloc[0]) == 6  # no overlap: same sets

    # depth via synthetic bathymetry
    arr = np.full((10, 10), -30.0)
    bt = GeoTiff(array=arr, origin_x=-180.0, origin_y=85.0, pixel_w=36.0, pixel_h=17.0, epsg=4326)
    fac.add_depth(min_cage_threshold=5.0, default_cage_depth=10.0, bathymetry=bt)
    assert float(fac.final_facilities["cage_depth"].iloc[0]) == pytest.approx(15.0)

    errs = pd.DataFrame(
        {"pass": ["2013-2015"], "farm_type": ["circle_farm"],
         "model_error_mean": [0.0], "model_error_sd": [5.0]}
    )
    pft = pd.DataFrame(
        {"pass": ["2013-2015"],
         "Factor Stocking density": [12.0], "Standard deviation Stocking density": [1.0],
         "Factor Annual harvest frequency": [0.6],
         "Standard deviation Annual harvest frequency": [0.05]}
    )
    est = compute_facility_tonnage_estimates(
        facility_df=fac.final_facilities,
        period_factor_table=pft,
        period_var="pass",
        min_cage_threshold=5.0,
        preds_df=fac.preds,
        model_error_distributions=errs,
        depth_dist_mixture_param=0.8,
        K=1000,
        seed=0,
    )
    assert float(est.loc["2013-2015", "tonnage"]) > 0


def test_aquafacility_pickle_roundtrip(tmp_path):
    from aquaculture_tpu.tonnage.facility import AquaFacility, load_AquaFacility

    preds, boxes = _facility_fixture()
    fac = AquaFacility(preds, boxes, map_year_to_image_pass, min_cluster_size=5)
    p = str(tmp_path / "fac.pkl")
    fac.save(p)
    loaded = load_AquaFacility(p)
    assert len(loaded.final_facilities) == len(fac.final_facilities)


@pytest.mark.parametrize("seed", range(5))
def test_year_dedup_min_max_ordering_fuzz(seed):
    """On random worlds: min-selection cage area <= any random selection <=
    max-selection, coverage disjoint per pass, survivors subset of input."""
    rng = np.random.default_rng(1000 + seed)
    years = [2013, 2014, 2015]
    boxes_recs = {"bbox_ind": [], "x_offset": [], "y_offset": [], "year": [], "image_file": []}
    box_geoms = []
    for ti in range(2):  # two tiles
        x0 = 2000.0 * ti
        for y in years:
            if rng.random() < 0.2:
                continue  # some years missing imagery
            # random whitespace: cover a sub-rectangle of the tile
            w = rng.uniform(600, 1000)
            h = rng.uniform(600, 1000)
            boxes_recs["bbox_ind"].append(ti)
            boxes_recs["x_offset"].append(0)
            boxes_recs["y_offset"].append(0)
            boxes_recs["year"].append(y)
            boxes_recs["image_file"].append(f"t{ti}y{y}")
            box_geoms.append(_poly.box(x0, 0.0, x0 + w, h))
    boxes = gf.GeoFrame(boxes_recs, geometry=box_geoms, crs=3857)

    cage_recs = {"image": [], "year": [], "area": [], "index": []}
    cage_geoms = []
    idx = 0
    for ti in range(2):
        x0 = 2000.0 * ti
        for y in years:
            if y not in set(boxes[boxes["bbox_ind"] == ti]["year"]):
                continue
            for _ in range(int(rng.integers(1, 4))):
                cx = x0 + rng.uniform(50, 950)
                cy = rng.uniform(50, 950)
                cage_recs["image"].append(f"ORTHOIMAGERY.ORTHOPHOTOS{y}_{ti}_0_0.jpeg")
                cage_recs["year"].append(y)
                cage_recs["area"].append(float(rng.uniform(10, 100)))
                cage_recs["index"].append(idx)
                idx += 1
                cage_geoms.append(_poly.box(cx - 4, cy - 4, cx + 4, cy + 4))
    cages = gf.GeoFrame(cage_recs, geometry=cage_geoms, crs=3857)

    areas = {}
    for sel in ("min", "random", "max"):
        dd, cov = dedup_cages_in_overlap_years_with_white_space(
            cages, boxes, map_year_to_image_pass, sel, seed=seed
        )
        areas[sel] = float(dd["area"].sum()) if len(dd) else 0.0
        # survivors are a subset of the input
        assert set(dd["index"]) <= set(cages["index"])
        # coverage disjoint per pass
        for p, c in cov.items():
            gs = list(c["geometry"])
            for i in range(len(gs)):
                for j in range(i + 1, len(gs)):
                    from aquaculture_tpu.geo.polygon import intersection_area

                    assert intersection_area(gs[i], gs[j]) < 1e-6
    assert areas["min"] <= areas["random"] + 1e-9
    assert areas["random"] <= areas["max"] + 1e-9


def _two_period_world():
    """Two 6-cage clusters in different periods, one shared coverage box
    per year (both years image the full 0..6000 m strip)."""
    recs = {k: [] for k in ("image", "year", "det_conf", "type", "area",
                            "area_var", "min_area", "max_area")}
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
    preds = gf.GeoFrame(recs, geometry=geoms, crs=3857)
    boxes = gf.GeoFrame(
        {"bbox_ind": [0, 0], "x_offset": [0, 0], "y_offset": [0, 0],
         "year": [2013, 2017], "image_file": ["a", "b"]},
        geometry=[_poly.box(0, 0, 6000, 1200)] * 2,
        crs=3857,
    )
    errs = pd.DataFrame(
        {"pass": ["2013-2015", "2016-2018"],
         "farm_type": ["circle_farm"] * 2,
         "model_error_mean": [0.0] * 2, "model_error_sd": [5.0] * 2}
    )
    pft = pd.DataFrame(
        {"pass": ["2013-2015", "2016-2018"],
         "Factor Stocking density": [12.0] * 2,
         "Standard deviation Stocking density": [1.0] * 2,
         "Factor Annual harvest frequency": [0.6] * 2,
         "Standard deviation Annual harvest frequency": [0.05] * 2}
    )
    return preds, boxes, errs, pft


def _facility_from(preds, boxes):
    from aquaculture_tpu.tonnage.facility import AquaFacility

    fac = AquaFacility(preds, boxes, map_year_to_image_pass, min_cluster_size=5)
    fac.compute_min_max_cages()
    fac.final_facilities["cage_depth"] = 12.0
    return fac


def test_period_imputation_crs_invariance():
    """Round-4b regression: predictions in EPSG:4326 (the CRS cli/geocode
    writes) must impute IDENTICALLY to the same world in 3857. Before the
    fix, the coverage test intersected raw 4326 degrees against 3857-meter
    coverage polygons (never true), so every compare-period facility was
    classified 'outside coverage' and whole periods were double-counted."""
    from aquaculture_tpu.tonnage.facility import (
        compute_complete_period_tonnage_estimates,
    )

    preds, boxes, errs, pft = _two_period_world()
    fac_m = _facility_from(preds, boxes)
    preds_deg = preds.to_crs(4326)
    preds_deg.crs = 4326
    fac_deg = _facility_from(preds_deg, boxes)

    kw = dict(
        current_period="2016-2018", compare_period="2013-2015",
        model_error_distributions=errs, min_cage_threshold=5.0,
        period_factor_table=pft, depth_dist_mixture_param=0.8,
        K=500, seed=0,
    )
    est_m = compute_complete_period_tonnage_estimates(fac_m, **kw)
    est_deg = compute_complete_period_tonnage_estimates(fac_deg, **kw)

    # 2013's cages lie INSIDE 2016-2018's coverage (same strip imaged both
    # years), so nothing is imputed: the estimate equals the direct
    # current-period bootstrap, and is CRS-invariant.
    t_m = float(est_m.loc["2016-2018", "tonnage"])
    t_deg = float(est_deg.loc["2016-2018", "tonnage"])
    assert t_m == pytest.approx(t_deg, rel=1e-9)

    direct = compute_facility_tonnage_estimates(
        facility_df=fac_m.final_facilities[
            fac_m.final_facilities["pass"] == "2016-2018"
        ],
        period_factor_table=pft, period_var="pass", min_cage_threshold=5.0,
        preds_df=fac_m.preds, model_error_distributions=errs,
        depth_dist_mixture_param=0.8, K=500, seed=0,
    )
    assert t_m == pytest.approx(float(direct.loc["2016-2018", "tonnage"]), rel=1e-9)


def test_bounded_tonnage_crs_invariance():
    """Round-4b regression: a 3857-meter bound geometry against 4326
    predictions previously emptied every cage list (raw-coordinate
    intersects), so the Trujillo comparison always printed 0.0 / 0."""
    from aquaculture_tpu.results.tonnage_report import trujillo_comparison

    preds, boxes, errs, pft = _two_period_world()
    fac_m = _facility_from(preds, boxes)
    preds_deg = preds.to_crs(4326)
    preds_deg.crs = 4326
    fac_deg = _facility_from(preds_deg, boxes)

    # +/-1000 m box around the 2013 cluster, in 3857 (trujillo_1km_boxes'
    # output convention)
    bound = _poly.box(100 - 1000, 100 - 1000, 200 + 1000, 110 + 1000)
    out = {}
    for name, fac in (("m", fac_m), ("deg", fac_deg)):
        cmp = trujillo_comparison(
            fac, bound, errs, pft, 5.0, 0.8,
            compare_period="2013-2015", K=500, bound_crs=3857,
        )
        pred = cmp[cmp["Source"] == "Predicted"].set_index("Measure")["Value"]
        out[name] = (float(pred["Tonnage"]), int(pred["Number of cages"]))
    assert out["m"][1] == 6  # the 2013 cluster's cages are inside the bound
    assert out["m"][0] > 0
    assert out["deg"] == pytest.approx(out["m"])


def test_conf_bins_match_reference():
    """The stratification bins are part of the reference study design
    (get_kfold_cluster_performance.py:28) — pin them."""
    from aquaculture_tpu.eval.buckets import CONF_BINS

    assert CONF_BINS == [0.0, 0.3, 0.5, 0.8, 1.0]
