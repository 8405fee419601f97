"""Structured logging.

The reference logs with bare ``print('[INFO] ...')`` statements
(reference: src/utils.py:210, src/utils_tonnage.py:652); here a standard
logging hierarchy under the ``aquaculture_tpu`` root with the same visual
prefix convention, so pipeline output stays familiar but filterable.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "[%(levelname)s] %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "aquaculture_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("aquaculture_tpu")
        root.addHandler(h)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)


def log_info(msg: str, *args) -> None:
    get_logger().info(msg, *args)


def log_warning(msg: str, *args) -> None:
    get_logger().warning(msg, *args)
