"""Sharded train step: edge-partitioned SpMM + batch-DP decoding.

The whole loss/grad computation runs inside ``shard_map`` over one mesh
axis: each device aggregates its edge shard (psum completes the SpMM),
scores its slice of the positive batch, draws its share of negative
samples, and the loss and gradients are psum-reduced — so parameters stay
replicated and the update is mathematically identical to the single-chip
step with the same total batch.  The optimizer update happens outside
shard_map on the replicated gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decagon_tpu.graph.device import DeviceGraph, EdgeType, etkey
from decagon_tpu.models.losses import LOSSES
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.parallel.mesh import graph_pspecs
from decagon_tpu.train.negatives import sample_unigram
from decagon_tpu.train.step import TrainConfig


def make_sharded_train_step(
    model: DecagonModel,
    edge_type: EdgeType,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    graph_template: DeviceGraph,
    axis: str = "edge",
) -> Callable:
    """Jitted ``step(params, opt_state, sharded_graph, k, rows, cols, rng)``.

    ``rows``/``cols`` are the full [batch_size] arrays; they are sharded
    over the mesh axis (batch_size must divide the axis size).
    """
    et_key = etkey(edge_type)
    loss_name = cfg.loss
    n_shards = mesh.shape[axis]
    if cfg.batch_size % n_shards != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over {n_shards} shards"
        )
    local_batch = cfg.batch_size // n_shards
    g_specs = graph_pspecs(graph_template, axis)

    def local_loss(params, graph: DeviceGraph, k, rows, cols, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        shard = jax.lax.axis_index(axis)
        # Encoder dropout masks are shared across devices (same rng):
        # every device sees identical projected features, so the psum'd
        # aggregation equals the single-chip forward draw-for-draw.
        # Scoring is deterministic given embeddings (reference parity —
        # optimizer.py:63-85 applies no decoder-input dropout).
        embeddings = model.embeddings(
            params, graph, enc_rng, deterministic=False, axis_name=axis
        )
        pos = model.score_edges(
            params, graph, embeddings, edge_type, k, rows, cols
        )
        neg_rows = sample_unigram(
            jax.random.fold_in(sample_rng, shard),
            graph.neg_cdf[et_key][k],
            local_batch,
        )
        neg = model.score_edges(
            params, graph, embeddings, edge_type, k, neg_rows, cols
        )
        if loss_name == "hinge":
            return LOSSES["hinge"](pos, neg, cfg.margin)
        return LOSSES["xent"](pos, neg, cfg.neg_sample_weight)

    def grads_fn(params, graph, k, rows, cols, rng):
        loss, grads = jax.value_and_grad(local_loss)(
            params, graph, k, rows, cols, rng
        )
        return jax.lax.psum(loss, axis), jax.lax.psum(grads, axis)

    sharded_grads = jax.shard_map(
        grads_fn,
        mesh=mesh,
        in_specs=(P(), g_specs, P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph, k, rows, cols, rng):
        loss, grads = sharded_grads(params, graph, k, rows, cols, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
