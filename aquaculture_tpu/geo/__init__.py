"""Geometry & CRS core: closed-form transforms and vectorized box/polygon ops.

Replaces the reference's GDAL/PROJ/GEOS dependency stack
(reference: requirements.txt — pyproj, shapely, geopandas) with
self-contained vectorized implementations.
"""

from aquaculture_tpu.geo.crs import (  # noqa: F401
    laea_forward,
    laea_inverse,
    mercator_forward,
    mercator_inverse,
    transform,
)
from aquaculture_tpu.geo.boxes import (  # noqa: F401
    box_area,
    box_intersection,
    box_iou,
    boxes_intersect,
)
from aquaculture_tpu.geo.boolean import (  # noqa: F401
    boolean_op,
    unary_union_tree,
    union_area,
)
