"""Sharded encoder + train step over the (row, edge) mesh.

The whole loss/grad computation runs inside ``shard_map``: each device

1. projects per-relation features (replicated compute from replicated
   params — free for identity features),
2. aggregates ITS edge shard into ITS destination-row block (dense
   ``[K_loc, Nb, Nj]`` einsum or local segment-sum — density dispatch
   survives sharding),
3. ``psum`` over the ``edge`` axis completes the row block,
4. ``all_gather`` over the ``row`` axis reassembles the full node table
   (the boundary exchange: per-device send volume is one row block, not
   the full table),
5. scores its slice of the batch, draws its share of negatives, and the
   loss and gradients are psum-reduced over both axes,

so parameters stay replicated and the update equals the single-chip step
with the same total batch.  The optimizer update happens outside
shard_map on the replicated gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from decagon_tpu.graph.device import EdgeType, etkey
from decagon_tpu.models.encoder import _project
from decagon_tpu.models.losses import LOSSES
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.ops.segment import l2_normalize_rows
from decagon_tpu.parallel.rowshard import (
    AXES,
    ShardedGraph,
    sharded_pspecs,
)
from decagon_tpu.train.negatives import sample_unigram
from decagon_tpu.train.step import TrainConfig


def encode_sharded(
    params,
    graph: ShardedGraph,
    rng: Optional[jax.Array],
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    spmm_impl: str = "auto",
    per_relation_dropout_max: int = 64,
    axes=AXES,
    spmm_precision: str = "highest",
) -> Dict[str, jax.Array]:
    """Two-layer encoder inside shard_map over a (row, edge) mesh.

    Same math as ``decagon_tpu.models.encoder.encode`` (reference
    ``decagon/deep/layers.py:70-118``); every device computes identical
    dropout masks (shared rng), so the psum'd + gathered aggregation
    equals the single-chip forward draw-for-draw.  Returns the FULL
    per-type node tables (identical on every device)."""
    row_ax, edge_ax = axes
    e_idx = jax.lax.axis_index(edge_ax)
    num_types = len(graph.num_nodes)

    def _rng(et, tag):
        if rng is None:
            return None
        return jax.random.fold_in(rng, tag * 1009 + et[0] * 31 + et[1])

    def aggregate(p_stack: jax.Array, adj) -> jax.Array:
        """sum_k A_k @ P_k -> full [N_i, H] via local block + collectives."""
        k, n_j, h = p_stack.shape
        nb = adj.n_rows_block
        use_dense = adj.dense is not None and spmm_impl in ("auto", "dense")
        use_pallas = adj.tiles_fwd is not None and (
            spmm_impl in ("pallas", "pallas_interpret")
            or (spmm_impl == "auto" and not use_dense
                and jax.default_backend() != "cpu")
        )
        if use_pallas:
            from decagon_tpu.ops.spmm_pallas import _spmm_pallas_flat_op

            # Per-shard tiled kernel: local edges scattered into the
            # local row block; the bwd tiling scatters cotangents into
            # the [K * Nj] projected space (per-device partials, summed
            # by the trailing grad psum).
            part = _spmm_pallas_flat_op(
                p_stack.reshape(k * n_j, h),
                adj.tiles_fwd.local(),
                adj.tiles_bwd.local(),
                nb,
                spmm_impl == "pallas_interpret",
                spmm_precision,
            )
        elif use_dense:
            # Relations are split over the edge axis; slice this device's
            # K_loc window (pad first so the window never clamps).
            p_pad = (
                jnp.pad(p_stack, ((0, adj.k_loc * graph.mesh_shape[1] - k),
                                  (0, 0), (0, 0)))
                if adj.k_loc * graph.mesh_shape[1] != k
                else p_stack
            )
            p_slice = jax.lax.dynamic_slice(
                p_pad, (e_idx * adj.k_loc, 0, 0), (adj.k_loc, n_j, h)
            )
            dense = adj.dense[0]
            if dense.dtype == jnp.bfloat16:
                p_slice = p_slice.astype(jnp.bfloat16)
            part = jnp.einsum(
                "kij,kjh->ih", dense, p_slice,
                preferred_element_type=jnp.float32,
            )  # [Nb, H]
        else:
            p_flat = p_stack.reshape(k * n_j, h)
            idx = adj.rel[0] * n_j + adj.senders[0]
            msgs = p_flat[idx] * adj.vals[0][:, None]
            part = jax.ops.segment_sum(
                msgs, adj.receivers[0], num_segments=nb
            )
        block = jax.lax.psum(part, edge_ax)  # [Nb, H]
        full = jax.lax.all_gather(
            block, row_ax, axis=0, tiled=True
        )  # [nr * Nb, H]
        return full[: adj.n_rows]

    def layer(level, inputs, relu, tag):
        out: Dict[str, jax.Array] = {}
        for i in range(num_types):
            acc = None
            for et in graph.edge_types:
                if et[0] != i:
                    continue
                key = etkey(et)
                p_stack = _project(
                    inputs[str(et[1])],
                    params[level][key],
                    _rng(et, tag),
                    dropout_rate,
                    deterministic,
                    per_relation_dropout_max,
                )
                term = l2_normalize_rows(
                    aggregate(p_stack, graph.adj[key])
                )
                acc = term if acc is None else acc + term
            if acc is None:
                raise ValueError(f"node type {i} has no incoming edge types")
            out[str(i)] = jax.nn.relu(acc) if relu else acc
        return out

    h1 = layer("enc1", graph.features, relu=True, tag=1)
    return layer("enc2", h1, relu=False, tag=2)


def make_sharded_train_step(
    model: DecagonModel,
    edge_type: EdgeType,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    graph_template: ShardedGraph,
    axes=AXES,
) -> Callable:
    """Jitted ``step(params, opt_state, sharded_graph, k, rows, cols,
    base_rng, step_no)``.

    ``rows``/``cols`` are the full [batch_size] arrays, data-parallel over
    all mesh devices (batch_size must divide the device count).  The
    per-step RNG is ``fold_in(base_rng, step_no)`` computed in-jit (same
    stream as the single-device step)."""
    et_key = etkey(edge_type)
    loss_name = cfg.loss
    n_shards = mesh.shape[axes[0]] * mesh.shape[axes[1]]
    if cfg.batch_size % n_shards != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over {n_shards} shards"
        )
    local_batch = cfg.batch_size // n_shards
    g_specs = sharded_pspecs(graph_template, axes)
    mc = model.config

    def local_loss(params, graph: ShardedGraph, k, rows, cols, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        shard = (
            jax.lax.axis_index(axes[0]) * mesh.shape[axes[1]]
            + jax.lax.axis_index(axes[1])
        )
        embeddings = encode_sharded(
            params, graph, enc_rng,
            dropout_rate=mc.dropout,
            deterministic=False,
            spmm_impl=mc.spmm_impl,
            per_relation_dropout_max=mc.per_relation_dropout_max,
            axes=axes,
            spmm_precision=mc.spmm_precision,
        )
        # Scoring is deterministic given embeddings (reference parity —
        # optimizer.py:63-85 applies no decoder-input dropout).
        pos = model.score_edges(
            params, graph, embeddings, edge_type, k, rows, cols
        )
        ns = max(1, cfg.neg_sample_size)
        neg_rows = sample_unigram(
            jax.random.fold_in(sample_rng, shard),
            graph.neg_cdf[et_key][k],
            local_batch * ns,
        )
        neg_cols = jnp.tile(cols, ns) if ns > 1 else cols
        neg = model.score_edges(
            params, graph, embeddings, edge_type, k, neg_rows, neg_cols
        )
        if loss_name == "hinge":
            pos_t = jnp.tile(pos, ns) if ns > 1 else pos
            return LOSSES["hinge"](pos_t, neg, cfg.margin)
        return LOSSES["xent"](pos, neg, cfg.neg_sample_weight)

    def grads_fn(params, graph, k, rows, cols, rng):
        loss, grads = jax.value_and_grad(local_loss)(
            params, graph, k, rows, cols, rng
        )
        return (
            jax.lax.psum(loss, axes),
            jax.lax.psum(grads, axes),
        )

    sharded_grads = jax.shard_map(
        grads_fn,
        mesh=mesh,
        in_specs=(P(), g_specs, P(), P(axes), P(axes), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph, k, rows, cols, base_rng, step_no):
        rng = jax.random.fold_in(base_rng, step_no)
        loss, grads = sharded_grads(params, graph, k, rows, cols, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_chunked_train_step(
    model: DecagonModel,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    graph_template: ShardedGraph,
    axes=AXES,
) -> Callable:
    """Device-resident multi-step training over the (row, edge) mesh: ONE
    jitted dispatch runs a ``lax.scan`` of optimization steps with a
    ``lax.switch`` over per-edge-type scoring branches — the mesh
    counterpart of ``decagon_tpu.train.step.make_chunked_train_step``
    (VERDICT r2 item 1: the mesh path previously paid a host round trip
    per step, which dominates on remote-attached chips).

    The whole chunk (scan + optimizer updates) runs INSIDE ``shard_map``:
    params/opt_state are replicated (every device computes the identical
    update from the psum'd gradients), the graph stays sharded, and the
    per-step batch is data-parallel over all devices.  Per-step math and
    the RNG stream (``fold_in(base_rng, step_no)``) are identical to
    ``make_sharded_train_step``, so loss traces match step-for-step.

    Returns ``chunk(params, opt_state, graph, base_rng, branch[C], k[C],
    rows[C,B], cols[C,B], step_no[C], valid[C]) -> (params, opt_state,
    losses[C])``; invalid steps are computed but fully masked (padding).
    """
    edge_types = graph_template.edge_types
    n_shards = mesh.shape[axes[0]] * mesh.shape[axes[1]]
    if cfg.batch_size % n_shards != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over {n_shards} shards"
        )
    g_specs = sharded_pspecs(graph_template, axes)
    mc = model.config
    ns = max(1, cfg.neg_sample_size)
    local_batch = cfg.batch_size // n_shards

    def local_loss(params, graph, branch, k, rows, cols, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        shard = (
            jax.lax.axis_index(axes[0]) * mesh.shape[axes[1]]
            + jax.lax.axis_index(axes[1])
        )
        embeddings = encode_sharded(
            params, graph, enc_rng,
            dropout_rate=mc.dropout,
            deterministic=False,
            spmm_impl=mc.spmm_impl,
            per_relation_dropout_max=mc.per_relation_dropout_max,
            axes=axes,
            spmm_precision=mc.spmm_precision,
        )

        def make_branch(et):
            et_key = etkey(et)

            def scoring(_):
                pos = model.score_edges(
                    params, graph, embeddings, et, k, rows, cols
                )
                neg_rows = sample_unigram(
                    jax.random.fold_in(sample_rng, shard),
                    graph.neg_cdf[et_key][k],
                    local_batch * ns,
                )
                neg_cols = jnp.tile(cols, ns) if ns > 1 else cols
                neg = model.score_edges(
                    params, graph, embeddings, et, k, neg_rows, neg_cols
                )
                if cfg.loss == "hinge":
                    pos_t = jnp.tile(pos, ns) if ns > 1 else pos
                    return LOSSES["hinge"](pos_t, neg, cfg.margin)
                return LOSSES["xent"](pos, neg, cfg.neg_sample_weight)

            return scoring

        return jax.lax.switch(
            branch, [make_branch(et) for et in edge_types], None
        )

    def local_chunk(params, opt_state, graph, base_rng, branch, k, rows,
                    cols, step_no, valid):
        def body(carry, xs):
            params, opt_state = carry
            b, kk, r, c, sn, v = xs
            rng = jax.random.fold_in(base_rng, sn)
            loss, grads = jax.value_and_grad(local_loss)(
                params, graph, b, kk, r, c, rng
            )
            loss = jax.lax.psum(loss, axes)
            grads = jax.lax.psum(grads, axes)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            keep = lambda n, o: jnp.where(v, n, o)
            params = jax.tree_util.tree_map(keep, new_params, params)
            opt_state = jax.tree_util.tree_map(keep, new_opt, opt_state)
            return (params, opt_state), jnp.where(v, loss, jnp.nan)

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (branch, k, rows, cols, step_no, valid)
        )
        return params, opt_state, losses

    sharded_chunk = jax.shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(
            P(), P(), g_specs, P(),
            P(), P(), P(None, axes), P(None, axes), P(), P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded_chunk, donate_argnums=(0, 1))


def make_sharded_embed_fn(
    model: DecagonModel,
    mesh: Mesh,
    graph_template: ShardedGraph,
    axes=AXES,
) -> Callable:
    """Jitted deterministic full-graph forward over the sharded graph:
    ``embed(params, sharded_graph) -> {"0": [N_0, H2], ...}`` (full,
    replicated node tables — feed straight into ``make_emb_scores``
    scorers / the ``AccuracyEvaluator``)."""
    g_specs = sharded_pspecs(graph_template, axes)
    mc = model.config

    def local(params, graph: ShardedGraph):
        return encode_sharded(
            params, graph, None,
            deterministic=True,
            spmm_impl=mc.spmm_impl,
            per_relation_dropout_max=mc.per_relation_dropout_max,
            axes=axes,
            spmm_precision=mc.spmm_precision,
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), g_specs),
            out_specs=P(),
            check_vma=False,
        )
    )
