"""Mesh + sharding-rule construction for the detector pipeline.

Sharding design (scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives over ICI):

* ``data`` axis — image tiles / batch. The one real scaling axis for a
  ~21M-param CNN detector: inference and training are embarrassingly
  data-parallel; XLA inserts a gradient ``psum`` (ICI all-reduce) for the
  backward pass.
* ``model`` axis — optional channel sharding (tensor parallelism) of wide
  conv kernels: HWIO weights are sharded on O where divisible, so each chip
  computes a channel slice; XLA all-gathers activations where a following
  layer needs full channels. Useful below-batch-1 latency floor; off (size 1)
  for throughput runs.

No pipeline/expert axes: the model has no layer-serial memory pressure at
this scale and no MoE; claiming PP/EP here would be dishonest (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    assert n_data * n_model <= len(devs), (n_data, n_model, len(devs))
    arr = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path_keys, shape, n_model: int):
    """Channel-shard conv kernels (HWIO on O) and their biases/BN vectors
    when the channel dim divides the model axis; replicate otherwise."""
    if n_model <= 1:
        return P()
    if len(shape) == 4 and shape[-1] % n_model == 0:  # HWIO conv kernel
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] % n_model == 0:  # bias / BN vector
        return P("model")
    return P()


def param_shardings(params, mesh: Mesh):
    """Sharding tree for a parameter pytree under the given mesh."""
    n_model = mesh.shape.get("model", 1)

    def one(path, leaf):
        return NamedSharding(mesh, _spec_for_param(path, getattr(leaf, "shape", ()), n_model))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(treedef, [one(p, l) for p, l in flat])


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with leading-axis sharding on `data`."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def shard_local_batch(batch: dict, mesh: Mesh) -> dict:
    """Multi-process DP: each process passes its LOCAL slice of the global
    batch (global = concatenation over processes along axis 0, in process
    order). Builds jax.Arrays spanning the global mesh without any host
    holding the full batch — the DCN-side input path for pod training."""
    from jax.experimental import multihost_utils

    return {
        k: multihost_utils.host_local_array_to_global_array(np.asarray(v), mesh, P("data"))
        for k, v in batch.items()
    }


def put_global(tree, shardings):
    """device_put that also works across processes. Contract: every process
    holds the FULL (identical) host value of each leaf. Single-process is a
    plain jax.device_put; multi-process builds each global jax.Array with
    make_array_from_callback, which hands every addressable device exactly
    the shard its sharding index selects — correct for replicated leaves
    AND leaves sharded across process boundaries."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def one(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree, shardings)
