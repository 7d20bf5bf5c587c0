"""Weight initializers (Glorot & Bengio uniform).

Parity spec: reference ``decagon/deep/inits.py:5-12`` — uniform in
``[-sqrt(6/(fan_in+fan_out)), +sqrt(6/(fan_in+fan_out))]``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def glorot(
    rng: jax.Array,
    shape: Sequence[int],
    fan: Tuple[int, int],
    dtype=jnp.float32,
) -> jax.Array:
    """Glorot-uniform sample of ``shape`` with explicit (fan_in, fan_out).

    ``fan`` is passed separately because stacked per-relation weights
    [K, F, H] use the per-matrix fan (F, H), and the reference initializes
    diagonal relation vectors as (d, 1)-fan matrices
    (``decagon/deep/layers.py:131-133, 158-160``).
    """
    limit = jnp.sqrt(6.0 / (fan[0] + fan[1]))
    return jax.random.uniform(
        rng, tuple(shape), dtype=dtype, minval=-limit, maxval=limit
    )
