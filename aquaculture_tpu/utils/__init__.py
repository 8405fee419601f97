"""Shared utilities: checkpointing, logging, stage timing."""

from aquaculture_tpu.utils.logging import get_logger, log_info, log_warning  # noqa: F401
from aquaculture_tpu.utils.timer import StageTimer  # noqa: F401
