"""Two-layer multi-relational graph-convolution encoder.

Math parity spec (reference ``decagon/deep/model.py:64-88`` +
``decagon/deep/layers.py:70-118``):

    layer 1:  T1_{ij} = l2norm_rows( sum_k A^{ij}_k (drop_k(X_j) W1^{ij}_k) )
              h1_i    = relu( sum_j T1_{ij} )
    layer 2:  T2_{ij} = l2norm_rows( sum_k A^{ij}_k (drop_k(h1_j) W2^{ij}_k) )
              emb_i   = sum_j T2_{ij}                       (no relu)

TPU-first restructure: per edge type the per-relation projection is ONE
stacked einsum ``P = einsum('knf,kfh->knh', X, W)`` (MXU), and the
relation-summed aggregation is ONE flat gather + segment-sum over the
padded edge stream (``decagon_tpu.ops.spmm``) — never a Python loop over
relations inside the compiled step, and never a feed-dict re-upload.

Dropout parity: the reference draws a fresh feature-dropout mask per
relation (the loop at ``layers.py:87-91``).  Identity features reproduce
this exactly via per-relation row masks on the weight stack (sparse
dropout on a one-hot matrix == row dropout after projection).  For dense
features, per-relation masks are materialized only while the relation
count is small (``per_relation_dropout_max``); beyond that a single
shared mask is used (same marginal distribution, bounded memory).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from decagon_tpu.graph.device import DeviceGraph, etkey, parse_etkey
from decagon_tpu.models.init import glorot
from decagon_tpu.ops.segment import dropout, l2_normalize_rows, row_dropout, spmm

Params = Dict[str, Dict[str, jax.Array]]


def init_encoder_params(
    rng: jax.Array,
    graph: DeviceGraph,
    hidden1: int,
    hidden2: int,
    dtype=jnp.float32,
) -> Params:
    """Stacked per-relation weights per edge type, Glorot-initialized.

    enc1[etk]: [K, F_j, hidden1]; enc2[etk]: [K, hidden1, hidden2] — one
    weight matrix per relation, matching ``layers.py:80-83,104-107``.
    """
    enc1, enc2 = {}, {}
    for et in graph.edge_types:
        key = etkey(et)
        k_rel = graph.num_relations(et)
        feat_dim = graph.feature_dims[et[1]]
        rng, r1, r2 = jax.random.split(rng, 3)
        enc1[key] = glorot(
            r1, (k_rel, feat_dim, hidden1), fan=(feat_dim, hidden1), dtype=dtype
        )
        enc2[key] = glorot(
            r2, (k_rel, hidden1, hidden2), fan=(hidden1, hidden2), dtype=dtype
        )
    return {"enc1": enc1, "enc2": enc2}


def _project(
    feat: Optional[jax.Array],
    weights: jax.Array,
    rng: Optional[jax.Array],
    rate: float,
    deterministic: bool,
    per_relation_dropout_max: int,
) -> jax.Array:
    """Per-relation projected features P [K, N_src, H]."""
    num_rel = weights.shape[0]
    if feat is None:
        # Identity features: X @ W == W; sparse dropout on the one-hot is
        # a per-(relation, node) row mask — exact reference parity.
        return row_dropout(rng, weights, rate, deterministic)
    if (
        not deterministic
        and rate > 0.0
        and rng is not None
        and num_rel <= per_relation_dropout_max
    ):
        rngs = jax.random.split(rng, num_rel)
        dropped = jax.vmap(lambda r: dropout(r, feat, rate))(rngs)
        return jnp.einsum(
            "knf,kfh->knh", dropped, weights,
            preferred_element_type=jnp.float32,
        )
    x = dropout(rng, feat, rate, deterministic)
    return jnp.einsum(
        "nf,kfh->knh", x, weights, preferred_element_type=jnp.float32
    )


def encode(
    params: Params,
    graph: DeviceGraph,
    rng: Optional[jax.Array],
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    spmm_impl: str = "xla",
    per_relation_dropout_max: int = 64,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Node embeddings per type: {"0": [N_0, H2], "1": [N_1, H2], ...}.

    With ``axis_name`` set (inside ``shard_map``), each device aggregates
    its local edge shard and the partial node sums are psum-reduced over
    the mesh axis before row normalization — edge-partitioned SpMM with
    replicated parameters (SURVEY.md §5.8's boundary-exchange design,
    expressed as an XLA collective over ICI).
    """
    num_types = len(graph.num_nodes)

    def layer(
        level: str,
        inputs: Dict[str, Optional[jax.Array]],
        relu: bool,
        tag: int,
    ) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        for i in range(num_types):
            acc = None
            for et in graph.edge_types:
                if et[0] != i:
                    continue
                key = etkey(et)
                layer_rng = (
                    jax.random.fold_in(
                        rng, tag * 1009 + et[0] * 31 + et[1]
                    )
                    if rng is not None
                    else None
                )
                p_stack = _project(
                    inputs[str(et[1])],
                    params[level][key],
                    layer_rng,
                    dropout_rate,
                    deterministic,
                    per_relation_dropout_max,
                )
                agg = spmm(p_stack, graph.adj[key], impl=spmm_impl)
                if axis_name is not None:
                    from decagon_tpu.parallel.collectives import all_reduce_sum

                    agg = all_reduce_sum(axis_name)(agg)
                term = l2_normalize_rows(agg)
                acc = term if acc is None else acc + term
            if acc is None:
                raise ValueError(f"node type {i} has no incoming edge types")
            out[str(i)] = jax.nn.relu(acc) if relu else acc
        return out

    h1 = layer("enc1", graph.features, relu=True, tag=1)
    return layer("enc2", h1, relu=False, tag=2)
