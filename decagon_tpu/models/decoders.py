"""Tensor-factorization decoders as (glb, loc) factor pairs.

Parity spec: reference ``decagon/deep/layers.py:121-213`` and the factor
materialization at ``decagon/deep/model.py:116-137`` — every decoder's
score is the bilinear chain ``z_r loc glb loc z_c^T`` with

    innerproduct: glb = I,        loc = I
    distmult:     glb = diag(r_k), loc = I
    bilinear:     glb = R_k,       loc = I
    dedicom:      glb = G (shared), loc = diag(d_k)

Scores here are computed only on sampled (row, col) pairs via
``decagon_tpu.ops.sddmm`` (no dense N x N reconstruction); the full score
matrix is available through ``score_matrix`` for the offline predictor.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from decagon_tpu.models.init import glorot
from decagon_tpu.ops.sddmm import sddmm_pairs

DECODER_NAMES = ("innerproduct", "distmult", "bilinear", "dedicom")

Params = Dict[str, jax.Array]


def init_decoder_params(
    rng: jax.Array, name: str, num_rel: int, dim: int
) -> Params:
    if name == "innerproduct":
        return {}
    if name == "distmult":
        # Reference inits each relation vector as a (dim, 1) glorot matrix
        # reshaped flat (layers.py:157-160).
        return {"relation_diag": glorot(rng, (num_rel, dim), fan=(dim, 1))}
    if name == "bilinear":
        return {"relation": glorot(rng, (num_rel, dim, dim), fan=(dim, dim))}
    if name == "dedicom":
        g_rng, d_rng = jax.random.split(rng)
        return {
            "global": glorot(g_rng, (dim, dim), fan=(dim, dim)),
            "local_diag": glorot(d_rng, (num_rel, dim), fan=(dim, 1)),
        }
    raise ValueError(f"unknown decoder: {name}")


def decoder_factors(
    params: Params, name: str, k: jax.Array
) -> Tuple[Optional[jax.Array], Optional[jax.Array], Optional[jax.Array]]:
    """(glb_full, glb_diag, loc_diag) for relation ``k`` (traced index)."""
    if name == "innerproduct":
        return None, None, None
    if name == "distmult":
        return None, params["relation_diag"][k], None
    if name == "bilinear":
        return params["relation"][k], None, None
    if name == "dedicom":
        return params["global"], None, params["local_diag"][k]
    raise ValueError(f"unknown decoder: {name}")


def score_edges(
    params: Params,
    name: str,
    k: jax.Array,
    z_rows: jax.Array,
    z_cols: jax.Array,
) -> jax.Array:
    """Logit scores for B sampled (row, col) pairs of relation ``k``."""
    glb, glb_diag, loc_diag = decoder_factors(params, name, k)
    return sddmm_pairs(
        z_rows, z_cols, glb=glb, loc_diag=loc_diag, glb_diag=glb_diag
    )


def score_matrix(
    params: Params,
    name: str,
    k: jax.Array,
    z_rows_all: jax.Array,
    z_cols_all: jax.Array,
) -> jax.Array:
    """Full [N_rows, N_cols] logit matrix for one relation.

    Mirrors the reference evaluator's dense ``predictions`` tensor
    (``decagon/deep/optimizer.py:87-106``); used only by the offline
    predictor / parity tests, never on the training path.
    """
    glb, glb_diag, loc_diag = decoder_factors(params, name, k)
    left = z_rows_all
    right = z_cols_all
    if loc_diag is not None:
        left = left * loc_diag[None, :]
        right = right * loc_diag[None, :]
    if glb is not None:
        left = jnp.dot(left, glb, preferred_element_type=jnp.float32)
    elif glb_diag is not None:
        left = left * glb_diag[None, :]
    return jnp.dot(left, right.T, preferred_element_type=jnp.float32)
