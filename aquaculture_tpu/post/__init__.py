"""Geospatial postprocessing: geocode, areas, dedup, land filter, clustering.

Vectorized jnp/numpy replacements for the reference's per-row
shapely/pyproj/sklearn loops (reference: src/process_yolo/,
src/cluster_facilities.py).
"""

from aquaculture_tpu.post.geocode import (  # noqa: F401
    geocode_detections,
    pixels_to_mercator,
    remove_land_detections,
    yolo_norm_to_pixels,
)
from aquaculture_tpu.post.areas import cage_areas, circle_areas, square_areas  # noqa: F401
from aquaculture_tpu.post.cluster import (  # noqa: F401
    cluster_facilities,
    dbscan,
    predictions_cluster,
)
from aquaculture_tpu.post.dedup import (  # noqa: F401
    deduplicate_download_boxes,
    deduplicate_gdf_with_bboxes,
)
