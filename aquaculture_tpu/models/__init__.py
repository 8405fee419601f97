"""Model zoo: the YOLOv5 detector family, built TPU-first in JAX."""

from aquaculture_tpu.models.plan import (  # noqa: F401
    ServingPlan,
    recommend_serving,
)
from aquaculture_tpu.models.yolov5 import (  # noqa: F401
    VARIANTS,
    YoloV5,
    yolov5_init,
)
