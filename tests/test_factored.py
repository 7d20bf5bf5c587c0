"""int8 factored dense stack: reconstruction + fwd/grad parity.

The degree normalization is rank-1 per relation (``graph/normalize.py``),
so ``build_device_graph(dense_factored=True)`` stores an int8 edge-count
mask + two scale vectors per relation; ``spmm_dense_factored`` must
reproduce the dense-stack aggregation (bf16 MXU rounding tolerance) and
its gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.ops.segment import spmm_dense_factored


@pytest.fixture(scope="module")
def world():
    graph = make_synthetic_graph(
        n_genes=90, n_drugs=50, n_drugdrug_types=3, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, edge_pad_multiple=128, dense_factored=True,
    )
    return graph, splits, dg


def test_factored_reconstructs_dense(world):
    """mask * a_i * b_j == the dense stack, cell for cell, every edge
    type (incl. the square-normalize transpose rule and rectangular
    row/col degrees)."""
    _, _, dg = world
    checked = 0
    for key, adj in dg.adj.items():
        assert adj.dense_mask is not None, key
        dense = np.asarray(adj.dense, np.float32)
        recon = (
            np.asarray(adj.dense_mask, np.float32)
            * np.asarray(adj.row_scale)[:, :, None]
            * np.asarray(adj.col_scale)[:, None, :]
        )
        np.testing.assert_allclose(recon, dense, rtol=1e-5, atol=1e-6)
        checked += 1
    assert checked >= 3


@pytest.mark.parametrize("key", ["0,0", "1,1", "0,1"])
def test_factored_fwd_and_grad_match_dense(world, key):
    _, _, dg = world
    adj = dg.adj[key]
    rng = np.random.default_rng(5)
    p = jnp.asarray(
        rng.standard_normal((adj.num_rel, adj.n_cols, 16)), jnp.float32
    )

    def f_dense(p):
        return jnp.einsum(
            "kij,kjh->ih", adj.dense.astype(jnp.float32), p,
            preferred_element_type=jnp.float32,
        )

    def f_fact(p):
        return spmm_dense_factored(
            p, adj.dense_mask, adj.dense_mask_t,
            adj.row_scale, adj.col_scale,
        )

    want, want_grad = jax.value_and_grad(
        lambda p: jnp.sum(jnp.tanh(f_dense(p) / 8.0))
    )(p), None
    got = jax.value_and_grad(
        lambda p: jnp.sum(jnp.tanh(f_fact(p) / 8.0))
    )(p)
    want = jax.value_and_grad(
        lambda p: jnp.sum(jnp.tanh(f_dense(p) / 8.0))
    )(p)
    # bf16 single-pass MXU rounding on the factored path.
    np.testing.assert_allclose(
        float(got[0]), float(want[0]), rtol=2e-2
    )
    scale = float(np.abs(np.asarray(want[1])).max())
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]),
        rtol=3e-2, atol=0.02 * max(scale, 1e-6),
    )


def test_factored_encoder_end_to_end(world):
    """spmm_impl='dense_factored' runs the full encoder + a train step."""
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    graph, splits, dg = world
    model = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, spmm_impl="dense_factored"), dg
    )
    model_ref = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, spmm_impl="dense"), dg
    )
    params = model.init_params(jax.random.PRNGKey(0), dg)
    emb = model.embeddings(params, dg, deterministic=True)
    emb_ref = model_ref.embeddings(params, dg, deterministic=True)
    for t in emb:
        scale = float(np.abs(np.asarray(emb_ref[t])).max())
        np.testing.assert_allclose(
            np.asarray(emb[t]), np.asarray(emb_ref[t]),
            rtol=3e-2, atol=0.02 * max(scale, 1e-6),
        )
    trainer = Trainer(
        model, graph, splits, dg, TrainConfig(batch_size=64), seed=0
    )
    losses = [
        float(trainer.train_batch(b))
        for b in list(trainer.scheduler.epoch())[:6]
    ]
    assert all(np.isfinite(l) for l in losses)
