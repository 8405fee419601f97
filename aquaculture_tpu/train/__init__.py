"""Training stack: loss, optimizer schedule, EMA, augmentation, train loop.

Reproduces the capability of the reference's ``train.py --img 640 --batch 16
--epochs 50`` invocation (reference: README.md:52) as a TPU-native
fixed-shape JAX implementation.
"""

from aquaculture_tpu.train.loss import yolo_loss  # noqa: F401
