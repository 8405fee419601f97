"""Multi-chip execution: device meshes, sharding rules, collective gather.

The reference has no distributed backend at all — its concurrency is a
process pool over CV folds and file-level parallelism against GCS
(reference: src/get_kfold_cluster_performance.py:506-527, src/utils.py:412).
Here distribution is first-class: a `jax.sharding.Mesh` with a `data` axis
(tiles/batch) and an optional `model` axis (channel-sharded wide convs),
GSPMD-partitioned by XLA with ICI collectives inserted automatically.
"""

from aquaculture_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
