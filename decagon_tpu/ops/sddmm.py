"""Sampled decoder scoring (SDDMM-shaped edge scoring).

TPU-first replacement for the reference's dense ``Z R Z^T`` reconstruction
+ diagonal extraction (``decagon/deep/optimizer.py:51-57``, decoder layers
``decagon/deep/layers.py:121-213``): only the sampled (row, col) entries
are ever computed —

    score[b] = (z_row[b] @ loc) @ glb @ (loc @ z_col[b])

which is mathematically identical on those entries while removing the
O(N^2 d) cost.  ``loc`` is diagonal (DEDICOM) or identity; ``glb`` is
full (bilinear/DEDICOM), diagonal (DistMult) or identity (inner product).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sddmm_pairs(
    z_rows: jax.Array,
    z_cols: jax.Array,
    glb: Optional[jax.Array] = None,
    loc_diag: Optional[jax.Array] = None,
    glb_diag: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched bilinear edge scores.

    z_rows, z_cols: [B, d] gathered endpoint embeddings.
    glb: optional [d, d] full interaction matrix.
    glb_diag: optional [d] diagonal interaction (DistMult).
    loc_diag: optional [d] per-relation local diagonal (DEDICOM).
    Returns [B] scores (logits; no sigmoid).
    """
    left = z_rows
    right = z_cols
    if loc_diag is not None:
        left = left * loc_diag[None, :]
        right = right * loc_diag[None, :]
    if glb is not None:
        left = jnp.dot(left, glb, preferred_element_type=jnp.float32)
    elif glb_diag is not None:
        left = left * glb_diag[None, :]
    return jnp.sum(left * right, axis=-1)
