"""Exponential moving average of model parameters.

Public YOLOv5 ModelEMA semantics: decay ramps in as
d(step) = decay * (1 - exp(-step / tau)), tau=2000, so early updates track
the raw parameters closely. Pure pytree op — jits and shards with the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step, decay: float = 0.9999, tau: float = 2000.0):
    d = decay * (1.0 - jnp.exp(-jnp.asarray(step, jnp.float32) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: (d * e.astype(jnp.float32) + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params,
        params,
    )
