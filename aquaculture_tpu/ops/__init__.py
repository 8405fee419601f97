"""Fixed-shape XLA ops for the detection pipeline (letterbox, NMS)."""

from aquaculture_tpu.ops.letterbox import letterbox  # noqa: F401
from aquaculture_tpu.ops.nms import batched_nms, batched_nms_feats, nms  # noqa: F401
