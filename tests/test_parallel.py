"""Multi-chip (virtual 8-device CPU mesh) sharding tests.

The crucial property: edge-partitioned aggregation + batch-DP scoring
inside shard_map produces the SAME loss and gradients as the single-chip
computation (deterministic setting), and the sharded train step runs and
learns.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.parallel.mesh import (
    graph_pspecs,
    make_mesh,
    shard_device_graph,
)
from decagon_tpu.parallel.sharded import make_sharded_train_step
from decagon_tpu.train.step import TrainConfig, make_optimizer


@pytest.fixture(scope="module")
def world():
    graph = make_synthetic_graph(
        n_genes=80, n_drugs=48, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.15, test_frac=0.1, seed=3)
    device_graph = build_device_graph(graph, splits, edge_pad_multiple=256)
    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8, dropout=0.0), device_graph)
    params = model.init_params(jax.random.PRNGKey(0), device_graph)
    return graph, splits, device_graph, model, params


def test_sharded_loss_and_grads_match_single_chip(world):
    graph, splits, device_graph, model, params = world
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    sharded_graph = shard_device_graph(device_graph, mesh)

    edge_type = (1, 1)
    k = jnp.int32(0)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)

    def single_loss(params, g):
        emb = model.embeddings(params, g, deterministic=True)
        scores = model.score_edges(
            params, g, emb, edge_type, k, rows, cols, deterministic=True
        )
        return jnp.sum(jnp.tanh(scores))

    want_loss, want_grads = jax.value_and_grad(single_loss)(
        params, device_graph
    )

    def local_loss(params, g, rows, cols):
        emb = model.embeddings(
            params, g, deterministic=True, axis_name="edge"
        )
        scores = model.score_edges(
            params, g, emb, edge_type, k, rows, cols, deterministic=True
        )
        return jnp.sum(jnp.tanh(scores))

    def local_grads(params, g, rows, cols):
        loss, grads = jax.value_and_grad(local_loss)(params, g, rows, cols)
        return jax.lax.psum(loss, "edge"), jax.lax.psum(grads, "edge")

    got_loss, got_grads = jax.jit(
        jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), graph_pspecs(device_graph), P("edge"), P("edge")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(params, sharded_graph, rows, cols)

    np.testing.assert_allclose(
        float(got_loss), float(want_loss), rtol=1e-5
    )
    flat_want = jax.tree_util.tree_leaves(want_grads)
    flat_got = jax.tree_util.tree_leaves(got_grads)
    assert len(flat_want) == len(flat_got)
    for w, g in zip(flat_want, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5
        )


def test_trainer_with_mesh_end_to_end(world):
    """The Trainer API drives the sharded step over the full round-robin
    schedule: every edge type's sharded step compiles and learns."""
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(8)
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2)
    trainer = Trainer(
        model, graph, splits, device_graph, cfg, seed=0, mesh=mesh
    )
    losses = []
    for batch in trainer.scheduler.epoch():
        losses.append(float(trainer.train_batch(batch)))
    assert losses and np.all(np.isfinite(losses))
    assert trainer.global_step == len(losses)

    with pytest.raises(ValueError, match="single-device"):
        Trainer(
            model, graph, splits, device_graph,
            TrainConfig(batch_size=64, scan_chunk=8), mesh=mesh,
        )


def test_sharded_train_step_runs_and_learns(world):
    graph, splits, device_graph, model, params = world
    mesh = make_mesh(8)
    sharded_graph = shard_device_graph(device_graph, mesh)
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(
        model, (1, 1), cfg, optimizer, mesh, device_graph
    )

    train = splits[(1, 1, 0)].train
    losses = []
    p = params
    for it in range(12):
        idx = np.random.default_rng(it).integers(0, len(train), size=64)
        rows = jnp.asarray(train[idx, 0])
        cols = jnp.asarray(train[idx, 1])
        p, opt_state, loss = step(
            p, opt_state, sharded_graph, jnp.int32(0), rows, cols,
            jax.random.PRNGKey(it),
        )
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
