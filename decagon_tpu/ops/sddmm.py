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
    glb: optional [d, d] full interaction matrix, or [B, d, d] per-edge
        (multi-relation batches: ``relation[k_e]`` gathered per edge).
    glb_diag: optional [d] or per-edge [B, d] diagonal interaction
        (DistMult).
    loc_diag: optional [d] or per-edge [B, d] local diagonal (DEDICOM).
    Returns [B] scores (logits; no sigmoid).
    """
    left = z_rows
    right = z_cols
    if loc_diag is not None:
        ld = loc_diag if loc_diag.ndim == 2 else loc_diag[None, :]
        left = left * ld
        right = right * ld
    if glb is not None:
        # precision HIGHEST: on TPU the default precision would run the
        # MXU in bf16 passes, making compiled jnp scores diverge from the
        # Pallas kernel (which fixes HIGHEST) — the two eval paths must
        # agree on hardware.
        if glb.ndim == 3:
            left = jnp.einsum(
                "bd,bde->be", left, glb,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            left = jnp.dot(
                left, glb,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    elif glb_diag is not None:
        gd = glb_diag if glb_diag.ndim == 2 else glb_diag[None, :]
        left = left * gd
    return jnp.sum(left * right, axis=-1)
