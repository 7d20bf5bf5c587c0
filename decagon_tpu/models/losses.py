"""Link-prediction losses.

Parity spec: reference ``decagon/deep/optimizer.py:108-127`` —
hinge (active in the reference) pairs positive/negative scores
elementwise: ``sum(relu(neg - pos + margin))``; sigmoid cross-entropy
(present, selectable) is ``sum(xent(pos, 1)) + w * sum(xent(neg, 0))``.
Both are sums, not means (learning-rate calibration matches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_loss(
    pos: jax.Array, neg: jax.Array, margin: float = 0.1
) -> jax.Array:
    return jnp.sum(jax.nn.relu(neg - pos + margin))


def xent_loss(
    pos: jax.Array, neg: jax.Array, neg_sample_weight: float = 1.0
) -> jax.Array:
    # -log sigmoid(pos) = softplus(-pos);  -log(1 - sigmoid(neg)) = softplus(neg)
    return jnp.sum(jax.nn.softplus(-pos)) + neg_sample_weight * jnp.sum(
        jax.nn.softplus(neg)
    )


LOSSES = {"hinge": hinge_loss, "xent": xent_loss}
