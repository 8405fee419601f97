"""Input pipeline: GeoTIFF reading, tile slicing, blank detection, batching.

TPU-native replacement for the reference's GDAL-based staging
(reference: src/load_data/tile_tifs.py — gdal.Translate tile slicing + JPEG
conversion): images are sliced as arrays, letterboxed on device, and fed as
batch-sharded bf16 tensors with host-side double-buffered prefetch. The
filename codec carries the geospatial tile offsets end to end
(reference: src/utils.py:372-389).
"""

from aquaculture_tpu.data.filenames import TileSpec, decode_tile_name, encode_tile_name  # noqa: F401
from aquaculture_tpu.data.tiling import split_image, tile_offsets  # noqa: F401
from aquaculture_tpu.data.blank import is_blank, is_partly_blank  # noqa: F401
