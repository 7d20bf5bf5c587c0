"""Multi-relational SpMM and elementwise primitives (XLA path).

The aggregation ``out = sum_k A_k @ P_k`` over an edge type's flattened
relation stack is expressed as one gather + one segment-sum — the shape
XLA lowers best on TPU (sorted scatter-add).  This is the reference
implementation and autodiff path; ``decagon_tpu.ops.spmm_pallas`` provides
the hand-written Pallas kernel for the same contract, selected via
``impl=`` / benchmarking (capability parity target: the two
``tf.sparse_tensor_dense_matmul`` calls at reference
``decagon/deep/layers.py:89-90,114``).
"""

from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING, Optional

import jax
import jax.numpy as jnp

if TYPE_CHECKING:  # avoid a circular import with graph.device
    from decagon_tpu.graph.device import EdgeTypeAdj


def spmm_segment(
    p_stack: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    rel: jax.Array,
    vals: jax.Array,
    n_out: int,
) -> jax.Array:
    """``out[r] = sum_e vals[e] * p_stack[rel[e], senders[e], :]``.

    ``p_stack``: [K, N_src, H] per-relation projected features.
    Padding edges must carry ``vals == 0``.
    """
    k, n_src, h = p_stack.shape
    p_flat = p_stack.reshape(k * n_src, h)
    flat_idx = rel * n_src + senders
    msgs = p_flat[flat_idx] * vals[:, None]
    return jax.ops.segment_sum(msgs, receivers, num_segments=n_out)


def spmm_dense(p_stack: jax.Array, dense_adj: jax.Array) -> jax.Array:
    """``sum_k A_k @ P_k`` as one batched MXU matmul.

    ``dense_adj``: [K, N_out, N_src] materialized adjacency stack.  For
    small relations (node counts in the hundreds-to-thousands) this is
    the fastest TPU formulation by a wide margin — the systolic array
    eats the zeros for free while every sparse formulation pays
    gather/scatter latency.  A ``bfloat16`` stack halves the HBM traffic
    of this memory-bound op (accumulation stays fp32 via
    ``preferred_element_type``); the projected features are cast to
    match so the MXU runs native bf16 x bf16 -> fp32 passes.
    """
    if dense_adj.dtype == jnp.bfloat16:
        p_stack = p_stack.astype(jnp.bfloat16)
    return jnp.einsum(
        "kij,kjh->ih", dense_adj, p_stack,
        preferred_element_type=jnp.float32,
    )


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def spmm_dense_factored(
    p_stack: jax.Array,
    mask: jax.Array,
    mask_t: jax.Array,
    row_scale: jax.Array,
    col_scale: jax.Array,
) -> jax.Array:
    """``sum_k diag(a_k) B_k diag(b_k) P_k`` with an int8 mask stack.

    The degree normalization is rank-1 per relation (``graph/
    normalize.py``: every value is ``a_k[i] * b_k[j]``), so the dense
    stack factors into an int8 edge-count mask ``B`` (1 byte/cell — half
    the bf16 stack's HBM traffic, which bounds this op at paper scale)
    plus two f32 scale vectors.  Forward: scale columns into the
    projected features (cheap), one batched int8->bf16 MXU matmul to
    ``[K, N_i, H]``, then the row-scaled reduction over relations.  The
    backward reads the PRE-TRANSPOSED ``mask_t`` — no runtime transpose
    of a multi-GB stack.  fp32 accumulation throughout; the bf16
    rounding matches the bf16 dense stack path's.
    """
    return _factored_fwd_math(p_stack, mask, row_scale, col_scale)


def _factored_fwd_math(p_stack, mask, row_scale, col_scale):
    pb = (p_stack * col_scale[:, :, None]).astype(jnp.bfloat16)
    kih = jax.lax.dot_general(
        mask.astype(jnp.bfloat16), pb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [K, N_i, H]
    return jnp.einsum(
        "ki,kih->ih", row_scale, kih, preferred_element_type=jnp.float32
    )


def _factored_fwd(p_stack, mask, mask_t, row_scale, col_scale):
    out = _factored_fwd_math(p_stack, mask, row_scale, col_scale)
    return out, (mask_t, row_scale, col_scale)


def _factored_bwd(res, ct):
    mask_t, row_scale, col_scale = res
    # d p_stack[k,j,h] = b_k[j] * sum_i B_k[j,i]^T a_k[i] ct[i,h]
    cta = (row_scale[:, :, None] * ct[None, :, :]).astype(jnp.bfloat16)
    kjh = jax.lax.dot_general(
        mask_t.astype(jnp.bfloat16), cta,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [K, N_j, H]
    dp = kjh * col_scale[:, :, None]
    return (dp, None, None, None, None)


spmm_dense_factored.defvjp(_factored_fwd, _factored_bwd)


def spmm(
    p_stack: jax.Array,
    adj: "EdgeTypeAdj",
    impl: str = "xla",
    precision: str = "highest",
) -> jax.Array:
    """Aggregate ``sum_k A_k @ P_k`` for one edge type."""
    if impl == "dense_factored":
        if adj.dense_mask is None:
            raise ValueError(
                "adjacency has no factored dense form; build the device "
                "graph with dense_factored=True"
            )
        return spmm_dense_factored(
            p_stack, adj.dense_mask, adj.dense_mask_t,
            adj.row_scale, adj.col_scale,
        )
    if impl == "dense":
        if adj.dense is None:
            raise ValueError(
                "adjacency has no dense stack; build the device graph "
                "with a densify_max_cells above this relation's size"
            )
        return spmm_dense(p_stack, adj.dense)
    if impl == "xla":
        return spmm_segment(
            p_stack, adj.senders, adj.receivers, adj.rel, adj.vals, adj.n_rows
        )
    if impl in ("pallas", "pallas_interpret"):
        from decagon_tpu.ops.spmm_pallas import spmm_pallas

        return spmm_pallas(
            p_stack, adj,
            interpret=impl == "pallas_interpret",
            precision=precision,
        )
    raise ValueError(f"unknown spmm impl: {impl}")


def l2_normalize_rows(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row L2 normalization, matching ``tf.nn.l2_normalize`` semantics
    (``x * rsqrt(max(sum(x^2), eps))``; reference ``layers.py:93,117``)."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def dropout(
    rng: Optional[jax.Array],
    x: jax.Array,
    rate: float,
    deterministic: bool = False,
) -> jax.Array:
    """Inverted dropout (``tf.nn.dropout(x, keep_prob=1-rate)`` parity)."""
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


def row_dropout(
    rng: Optional[jax.Array],
    x: jax.Array,
    rate: float,
    deterministic: bool = False,
) -> jax.Array:
    """Drop entire rows (last-axis vectors kept/zeroed together).

    Equivalent to the reference's sparse dropout over one-hot identity
    features (``decagon/deep/layers.py:23-31,88``): dropping a nonzero of
    the identity matrix zeroes that node's whole projected row.
    Applies one mask per leading batch dims except the last axis.
    """
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask_shape = x.shape[:-1] + (1,)
    mask = jax.random.bernoulli(rng, p=keep, shape=mask_shape)
    return jnp.where(mask, x / keep, 0.0)
