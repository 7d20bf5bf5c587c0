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


def spmm(
    p_stack: jax.Array,
    adj: "EdgeTypeAdj",
    impl: str = "xla",
    precision: str = "highest",
) -> jax.Array:
    """Aggregate ``sum_k A_k @ P_k`` for one edge type."""
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
