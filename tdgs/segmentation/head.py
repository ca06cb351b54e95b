"""Segmentation head MLP: identity encodings → rendered feature space.

The reference builds a torch Sequential 16→64→16 with ReLU
(examples/simple_trainer.py:439-452); here it's a two-layer params dict +
pure apply fn that jits into the train step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_segmentation_head(
    key: jax.Array, in_dim: int = 16, hidden: int = 64, out_dim: int = 16
) -> Dict[str, jnp.ndarray]:
    k1, k2 = jax.random.split(key)
    s1 = (2.0 / in_dim) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    return {
        "w1": jax.random.normal(k1, (in_dim, hidden)) * s1,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, out_dim)) * s2,
        "b2": jnp.zeros((out_dim,)),
    }


def apply_segmentation_head(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray
) -> jnp.ndarray:
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]
