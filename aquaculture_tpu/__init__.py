"""aquaculture_tpu — a TPU-native aquaculture remote-sensing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
reglab/aquaculture pipeline (see /root/reference): coastal imagery ingestion,
tiling, YOLOv5-family cage detection, geospatial postprocessing
(geocoding, area estimation, deduplication, facility clustering), tonnage
estimation, and statistical evaluation — designed TPU-first:

* compute path: jnp / pallas kernels, fixed shapes, bf16 matmuls on the MXU
* scale-out: ``jax.sharding.Mesh`` + jit-sharded batch inference; ICI
  collectives for detection gathering, DCN for multi-host corpus sharding
* geometry/CRS core: closed-form Web-Mercator and LAEA(3035) transforms as
  vectorized jnp/numpy functions (no GDAL/PROJ/GEOS dependency)
"""

__version__ = "0.1.0"

from aquaculture_tpu.config import (  # noqa: F401
    CRS_AREA,
    CRS_LATLON,
    CRS_MAPPING,
    IM_HEIGHT,
    IM_WIDTH,
    LARGE_TIF_SIZE,
)
