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
import numpy as np

from decagon_tpu.graph.device import DeviceGraph, etkey, parse_etkey
from decagon_tpu.models.init import glorot
from decagon_tpu.ops.segment import dropout, l2_normalize_rows, row_dropout, spmm

Params = Dict[str, Dict[str, jax.Array]]

# spmm_impl values that activate the paired factored path for edge
# types carrying a pair_mask (ops/spmm_paired.py).
PAIRED_IMPLS = ("auto", "paired", "paired_ref", "paired_interpret")


def paired_edge_types(graph: DeviceGraph, spmm_impl: str) -> set:
    """Edge-type keys that run the PAIRED factored path — and therefore
    store their encoder weights TRANSPOSED ``[2K, H, F]``.  Must agree
    between ``init_encoder_params`` and ``encode`` (the weight layout is
    decided at init)."""
    if spmm_impl not in PAIRED_IMPLS:
        return set()
    return {
        key
        for key, adj in graph.adj.items()
        if getattr(adj, "pair_mask", None) is not None
    }


def init_encoder_params(
    rng: jax.Array,
    graph: DeviceGraph,
    hidden1: int,
    hidden2: int,
    dtype=jnp.float32,
    spmm_impl: str = "auto",
) -> Params:
    """Stacked per-relation weights per edge type, Glorot-initialized.

    enc1[etk]: [K, F_j, hidden1]; enc2[etk]: [K, hidden1, hidden2] — one
    weight matrix per relation, matching ``layers.py:80-83,104-107``.
    Paired edge types (``paired_edge_types``) store the SAME weights
    transposed — [K, hidden1, F_j] / [K, hidden2, hidden1] — so the
    paired kernel's ``[.., H, N]`` data layout needs no per-step
    relayout and every elementwise pass over the stacks moves ~40%
    fewer physical bytes (the H=64/32 minor dim no longer pads to 128
    lanes).
    """
    paired = paired_edge_types(graph, spmm_impl)
    enc1, enc2 = {}, {}
    for et in graph.edge_types:
        key = etkey(et)
        k_rel = graph.num_relations(et)
        feat_dim = graph.feature_dims[et[1]]
        rng, r1, r2 = jax.random.split(rng, 3)
        if key in paired:
            # [2, K, H, F]: the leading (half, pair) split mirrors the
            # paired kernel's operand shape EXACTLY, so the whole
            # project -> aggregate -> cotangent -> grad chain is
            # reshape-free (XLA fuses the bf16 casts into the dropout /
            # dW fusions only when no bitcast splits the chain).
            enc1[key] = glorot(
                r1, (2, k_rel // 2, hidden1, feat_dim),
                fan=(feat_dim, hidden1), dtype=dtype,
            )
            enc2[key] = glorot(
                r2, (2, k_rel // 2, hidden2, hidden1),
                fan=(hidden1, hidden2), dtype=dtype,
            )
        else:
            enc1[key] = glorot(
                r1, (k_rel, feat_dim, hidden1), fan=(feat_dim, hidden1),
                dtype=dtype,
            )
            enc2[key] = glorot(
                r2, (k_rel, hidden1, hidden2), fan=(hidden1, hidden2),
                dtype=dtype,
            )
    return {"enc1": enc1, "enc2": enc2}


def _project(
    feat: Optional[jax.Array],
    weights: jax.Array,
    rng: Optional[jax.Array],
    rate: float,
    deterministic: bool,
    per_relation_dropout_max: int,
    identity_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-relation projected features P [K, N_src, H].

    ``identity_mask``: optional precomputed keep-mask [K, F, 1] for the
    identity-feature fast path — lets the caller draw ONE bernoulli for
    all edge types of a layer instead of one RNG chain per edge type.
    """
    num_rel = weights.shape[0]
    keep = 1.0 - rate
    if feat is None:
        # Identity features: X @ W == W; sparse dropout on the one-hot is
        # a per-(relation, node) row mask — exact reference parity.
        if identity_mask is not None:
            if deterministic or rate <= 0.0:
                return weights
            return jnp.where(identity_mask, weights / keep, 0.0)
        return row_dropout(rng, weights, rate, deterministic)
    if identity_mask is not None and not deterministic and rate > 0.0:
        # Precomputed dense-feature mask: [K, N, F] (fresh mask per
        # relation, reference layers.py:87-91) or [N, F] (shared).
        dropped = jnp.where(identity_mask, feat / keep, 0.0)
        if identity_mask.ndim == 3:
            return jnp.einsum(
                "knf,kfh->knh", dropped, weights,
                preferred_element_type=jnp.float32,
            )
        return jnp.einsum(
            "nf,kfh->knh", dropped, weights,
            preferred_element_type=jnp.float32,
        )
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


def _project_t(
    feat: Optional[jax.Array],
    weights_t: jax.Array,
    rng: Optional[jax.Array],
    rate: float,
    deterministic: bool,
    per_relation_dropout_max: int,
    identity_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """TRANSPOSED projection for paired edge types: P^T [2, K, H, N].

    ``weights_t``: [2, K, H, F] transposed weight stacks (leading dim
    = direct/transposed half).  Same math as ``_project`` (same dropout
    semantics); the einsum emits the [.., H, N] layout the paired
    kernel consumes directly — no dot output transpose, no 128-lane
    padding of the H minor dim, and no reshape between the projection
    and the kernel (a bitcast there blocks XLA's cast/select fusions).
    ``identity_mask``: [2, K, 1, F] for identity features
    (per-(relation, node) row mask == lane mask in this layout),
    [2K, N, F] or [N, F] for dense features.
    """
    two, num_pair = weights_t.shape[0], weights_t.shape[1]
    keep = 1.0 - rate
    if feat is None:
        if identity_mask is not None:
            if deterministic or rate <= 0.0:
                return weights_t
            return jnp.where(identity_mask, weights_t / keep, 0.0)
        if deterministic or rate <= 0.0 or rng is None:
            return weights_t
        mask = jax.random.bernoulli(
            rng, p=keep, shape=(two, num_pair, 1, weights_t.shape[3])
        )
        return jnp.where(mask, weights_t / keep, 0.0)
    if identity_mask is not None and not deterministic and rate > 0.0:
        dropped = jnp.where(identity_mask, feat / keep, 0.0)
        if identity_mask.ndim == 3:
            # fresh mask per relation: [2K, N, F] reshaped to pair form
            dropped = dropped.reshape(
                two, num_pair, *dropped.shape[1:]
            )
            return jnp.einsum(
                "skhf,sknf->skhn", weights_t, dropped,
                preferred_element_type=jnp.float32,
            )
        return jnp.einsum(
            "skhf,nf->skhn", weights_t, dropped,
            preferred_element_type=jnp.float32,
        )
    if (
        not deterministic
        and rate > 0.0
        and rng is not None
        and 2 * num_pair <= per_relation_dropout_max
    ):
        rngs = jax.random.split(rng, 2 * num_pair)
        dropped = jax.vmap(lambda r: dropout(r, feat, rate))(rngs)
        dropped = dropped.reshape(two, num_pair, *dropped.shape[1:])
        return jnp.einsum(
            "skhf,sknf->skhn", weights_t, dropped,
            preferred_element_type=jnp.float32,
        )
    x = dropout(rng, feat, rate, deterministic)
    return jnp.einsum(
        "skhf,nf->skhn", weights_t, x, preferred_element_type=jnp.float32
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
    spmm_precision: str = "highest",
) -> Dict[str, jax.Array]:
    """Node embeddings per type: {"0": [N_0, H2], "1": [N_1, H2], ...}.

    With ``axis_name`` set (inside ``shard_map``), each device aggregates
    its local edge shard and the partial node sums are psum-reduced over
    the mesh axis before row normalization — edge-partitioned SpMM with
    replicated parameters (SURVEY.md §5.8's boundary-exchange design,
    expressed as an XLA collective over ICI).
    """
    on_accel = jax.default_backend() != "cpu"
    paired = paired_edge_types(graph, spmm_impl)
    if paired and spmm_impl.startswith("fused"):
        raise ValueError(
            "fused spmm impls are incompatible with paired mask stacks; "
            "build the device graph without dense_paired"
        )
    # Non-paired edge types under an explicit paired impl fall back to
    # the auto dispatch (the paired request only binds pair-capable
    # edge types).
    base_impl = "auto" if spmm_impl in ("paired", "paired_ref",
                                        "paired_interpret") else spmm_impl

    def _resolve_impl(adj) -> str:
        """Per-edge-type dispatch: the int8 factored stack (half the HBM
        traffic) when built, dense MXU matmul for small relations, the
        Pallas tiled kernel when tilings exist, XLA otherwise."""
        if base_impl != "auto":
            return base_impl
        if on_accel and getattr(adj, "dense_mask", None) is not None:
            return "dense_factored"
        if on_accel and adj.dense is not None:
            return "dense"
        if on_accel and adj.tiles_fwd is not None:
            return "pallas"
        return "xla"

    num_types = len(graph.num_nodes)

    def _layer_rng(et, tag):
        if rng is None:
            return None
        return jax.random.fold_in(rng, tag * 1009 + et[0] * 31 + et[1])

    def _layer_masks(level: str, tag: int, inputs):
        """ONE bernoulli draw per layer covering every edge type's
        dropout mask; returns {etkey: mask}.  Mask shapes: [K, F, 1]
        (identity features: per-(relation, node) row mask), [K, N, F]
        (dense, fresh mask per relation — reference layers.py:87-91) or
        [N, F] (dense, relation count above the per-relation cap).
        Collapses the per-edge-type RNG chains (fold_in + bernoulli
        each) that dominate encoder latency at small graph sizes."""
        if rng is None or deterministic or dropout_rate <= 0.0:
            return {}
        spans = []
        total = 0
        for et in graph.edge_types:
            key = etkey(et)
            w = params[level][key]
            k = 2 * w.shape[1] if key in paired else w.shape[0]
            feat = inputs[str(et[1])]
            if feat is None:
                # identity row mask: (K, F, 1) in the standard layout,
                # (2, K/2, 1, F) against the paired [2, K/2, H, F] stacks
                shape = (
                    (2, w.shape[1], 1, w.shape[3]) if key in paired
                    else (k, w.shape[1], 1)
                )
            elif k <= per_relation_dropout_max:
                shape = (k,) + feat.shape
            else:
                shape = feat.shape
            spans.append((key, total, shape))
            total += int(np.prod(shape))
        bits = jax.random.bernoulli(
            jax.random.fold_in(rng, tag * 7919),
            p=1.0 - dropout_rate,
            shape=(total,),
        )
        return {
            key: bits[start : start + int(np.prod(shape))].reshape(shape)
            for key, start, shape in spans
        }

    def layer(
        level: str,
        inputs: Dict[str, Optional[jax.Array]],
        relu: bool,
        tag: int,
    ) -> Dict[str, jax.Array]:
        masks = _layer_masks(level, tag, inputs)
        out: Dict[str, jax.Array] = {}
        for i in range(num_types):
            acc = None
            for et in graph.edge_types:
                if et[0] != i:
                    continue
                key = etkey(et)
                if key in paired:
                    from decagon_tpu.ops.spmm_paired import (
                        spmm_paired,
                        spmm_paired_identity,
                    )

                    pimpl = (
                        spmm_impl
                        if spmm_impl.startswith("paired")
                        else "auto"
                    )
                    adj = graph.adj[key]
                    if inputs[str(et[1])] is None:
                        # Identity features: the kernel consumes the
                        # raw weight stack and the per-step dropout
                        # keep-scales directly — no projection, select,
                        # or cast pass in XLA at all.
                        m4 = masks.get(key)
                        ds = None
                        if (
                            m4 is not None
                            and not deterministic
                            and dropout_rate > 0.0
                        ):
                            k8, _, n_pad = adj.pair_scales.shape
                            kp, f = m4.shape[1], m4.shape[3]
                            keep = 1.0 - dropout_rate
                            ds = jnp.zeros((k8, 2, n_pad), jnp.float32)
                            ds = ds.at[:kp, :, :f].set(
                                jnp.where(
                                    m4[:, :, 0, :], 1.0 / keep, 0.0
                                ).transpose(1, 0, 2)
                            )
                        agg = spmm_paired_identity(
                            params[level][key], ds, adj, impl=pimpl
                        )
                    else:
                        p_t = _project_t(
                            inputs[str(et[1])],
                            params[level][key],
                            _layer_rng(et, tag),
                            dropout_rate,
                            deterministic,
                            per_relation_dropout_max,
                            identity_mask=masks.get(key),
                        )
                        agg = spmm_paired(p_t, adj, impl=pimpl)
                else:
                    p_stack = _project(
                        inputs[str(et[1])],
                        params[level][key],
                        _layer_rng(et, tag),
                        dropout_rate,
                        deterministic,
                        per_relation_dropout_max,
                        identity_mask=masks.get(key),
                    )
                    agg = spmm(
                        p_stack, graph.adj[key],
                        impl=_resolve_impl(graph.adj[key]),
                        precision=spmm_precision,
                    )
                if axis_name is not None:
                    from decagon_tpu.parallel.collectives import all_reduce_sum

                    agg = all_reduce_sum(axis_name)(agg)
                term = l2_normalize_rows(agg)
                acc = term if acc is None else acc + term
            if acc is None:
                raise ValueError(f"node type {i} has no incoming edge types")
            out[str(i)] = jax.nn.relu(acc) if relu else acc
        return out

    def fused_layer(
        level: str,
        inputs: Dict[str, Optional[jax.Array]],
        relu: bool,
        tag: int,
    ) -> Dict[str, jax.Array]:
        """Same math as ``layer`` with the aggregation of ALL edge types
        fused into one gather + one segment-sum over
        ``graph.fused`` (per-term row normalization unchanged)."""
        fa = graph.fused
        masks = _layer_masks(level, tag, inputs)
        parts = []
        for key, _, _, _ in fa.layout:
            et = parse_etkey(key)
            parts.append(
                _project(
                    inputs[str(et[1])],
                    params[level][key],
                    _layer_rng(et, tag),
                    dropout_rate,
                    deterministic,
                    per_relation_dropout_max,
                    identity_mask=masks.get(key),
                ).reshape(-1, params[level][key].shape[-1])
            )
        p_global = jnp.concatenate(parts, axis=0)
        if spmm_impl.startswith("fused_pallas"):
            from decagon_tpu.ops.spmm_pallas import spmm_pallas_flat

            t_global = spmm_pallas_flat(
                p_global, fa,
                interpret=spmm_impl == "fused_pallas_interpret",
                precision=spmm_precision,
            )
        else:
            msgs = p_global[fa.src] * fa.vals[:, None]
            t_global = jax.ops.segment_sum(
                msgs, fa.dst, num_segments=fa.n_t_rows
            )
        if axis_name is not None:
            from decagon_tpu.parallel.collectives import all_reduce_sum

            t_global = all_reduce_sum(axis_name)(t_global)
        out: Dict[str, jax.Array] = {}
        for i in range(num_types):
            acc = None
            for key, t_start, n_i in fa.terms:
                if parse_etkey(key)[0] != i:
                    continue
                term = l2_normalize_rows(t_global[t_start : t_start + n_i])
                acc = term if acc is None else acc + term
            if acc is None:
                raise ValueError(f"node type {i} has no incoming edge types")
            out[str(i)] = jax.nn.relu(acc) if relu else acc
        return out

    if spmm_impl.startswith("fused"):
        if graph.fused is None:
            raise ValueError(
                "spmm_impl='fused*' requires a device graph built with the "
                "fused stream (build_device_graph default)"
            )
        h1 = fused_layer("enc1", graph.features, relu=True, tag=1)
        return fused_layer("enc2", h1, relu=False, tag=2)

    h1 = layer("enc1", graph.features, relu=True, tag=1)
    return layer("enc2", h1, relu=False, tag=2)
