"""Data acquisition: WMS imagery download, bathymetry merge, land filter.

Port of the reference's load_data layer (reference: src/load_data/) with
network and object-store access behind injectable protocols, so the
orchestration logic (coast tiling, blank probing, resumability, retry) is
testable offline and the production transports plug in unchanged.
"""

from aquaculture_tpu.acquire.wms import (  # noqa: F401
    download_images_within_shape,
    tile_shapefile,
)
from aquaculture_tpu.acquire.bathymetry import merge_asc_grids, read_asc  # noqa: F401
from aquaculture_tpu.acquire.landfilter import build_land_filter  # noqa: F401
