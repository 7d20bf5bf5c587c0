"""Model-forward parity against the numpy transcription of the reference
TF math (deterministic: dropout off)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decagon_tpu.graph.device import build_device_graph, etkey
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.models import decoders as dec

from tests import reference_impl as ref


@pytest.fixture(scope="module")
def setup():
    graph = make_synthetic_graph(
        n_genes=60, n_drugs=30, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=1)
    device_graph = build_device_graph(graph, splits, edge_pad_multiple=256)
    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8), device_graph)
    params = model.init_params(jax.random.PRNGKey(0), device_graph)
    return graph, splits, device_graph, model, params


def _dense_normalized(splits, key, shape):
    s = splits[key]
    dense = np.zeros(shape)
    dense[s.adj_rows, s.adj_cols] = s.adj_vals
    return dense


def test_encoder_matches_numpy_reference(setup):
    graph, splits, device_graph, model, params = setup
    n0, n1 = graph.num_nodes

    adjacencies = {}
    for (i, j), rels in graph.relations.items():
        adjacencies[(i, j)] = [
            _dense_normalized(splits, (i, j, k), (graph.num_nodes[i], graph.num_nodes[j]))
            for k in range(len(rels))
        ]
    features = {0: np.eye(n0), 1: np.eye(n1)}
    w1 = {
        et: [np.asarray(params["enc1"][etkey(et)][k]) for k in range(len(rels))]
        for et, rels in graph.relations.items()
    }
    w2 = {
        et: [np.asarray(params["enc2"][etkey(et)][k]) for k in range(len(rels))]
        for et, rels in graph.relations.items()
    }
    want = ref.encoder_forward(adjacencies, features, w1, w2, num_types=2)

    got = model.embeddings(params, device_graph, deterministic=True)
    np.testing.assert_allclose(np.asarray(got["0"]), want[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["1"]), want[1], atol=1e-4)


@pytest.mark.parametrize("name", dec.DECODER_NAMES)
def test_decoder_scores_match_dense_chain(name):
    rng = np.random.default_rng(0)
    num_rel, d, b = 3, 8, 16
    z_rows_all = rng.normal(size=(40, d)).astype(np.float32)
    z_cols_all = rng.normal(size=(30, d)).astype(np.float32)
    params = dec.init_decoder_params(jax.random.PRNGKey(1), name, num_rel, d)
    k = 1
    rows = rng.integers(0, 40, size=b)
    cols = rng.integers(0, 30, size=b)

    glb = loc = None
    if name == "distmult":
        glb = np.diag(np.asarray(params["relation_diag"][k]))
    elif name == "bilinear":
        glb = np.asarray(params["relation"][k])
    elif name == "dedicom":
        glb = np.asarray(params["global"])
        loc = np.diag(np.asarray(params["local_diag"][k]))
    want_mtx = ref.decoder_score_matrix(name, z_rows_all, z_cols_all, glb, loc)

    got = dec.score_edges(
        params, name, jnp.int32(k), jnp.asarray(z_rows_all[rows]),
        jnp.asarray(z_cols_all[cols]),
    )
    np.testing.assert_allclose(
        np.asarray(got), want_mtx[rows, cols], atol=1e-4
    )

    got_mtx = dec.score_matrix(
        params, name, jnp.int32(k), jnp.asarray(z_rows_all),
        jnp.asarray(z_cols_all),
    )
    np.testing.assert_allclose(np.asarray(got_mtx), want_mtx, atol=1e-4)


def test_fused_encoder_matches_xla_path(setup):
    """The fused single-segment-sum encoder and its gradients must equal
    the per-edge-type XLA path exactly (same math, one aggregation)."""
    graph, splits, device_graph, model, params = setup

    def total(m):
        def loss(p):
            e = m.embeddings(p, device_graph, deterministic=True)
            return sum(jnp.sum(v * v) for v in e.values())
        return loss

    fused_model = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, spmm_impl="fused"), device_graph
    )
    want = model.embeddings(params, device_graph, deterministic=True)
    got = fused_model.embeddings(params, device_graph, deterministic=True)
    for t in want:
        np.testing.assert_allclose(
            np.asarray(got[t]), np.asarray(want[t]), atol=1e-5
        )
    g_want = jax.grad(total(model))(params)
    g_got = jax.grad(total(fused_model))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_want), jax.tree_util.tree_leaves(g_got)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dropout_preserves_expectation(setup):
    graph, splits, device_graph, model, params = setup
    cfg = ModelConfig(hidden1=16, hidden2=8, dropout=0.5)
    drop_model = DecagonModel(cfg, device_graph)
    det = np.asarray(model.embeddings(params, device_graph, deterministic=True)["1"])
    samples = []
    for s in range(32):
        emb = drop_model.embeddings(
            params, device_graph, jax.random.PRNGKey(s), deterministic=False
        )
        samples.append(np.asarray(emb["1"]))
    mean = np.mean(samples, axis=0)
    # Nonlinear layers mean dropout expectation is not exactly the
    # deterministic forward, but they should be strongly correlated.
    corr = np.corrcoef(mean.ravel(), det.ravel())[0, 1]
    assert corr > 0.8


def test_glorot_init_range():
    from decagon_tpu.models.init import glorot

    w = glorot(jax.random.PRNGKey(0), (4, 100, 50), fan=(100, 50))
    limit = np.sqrt(6.0 / 150)
    assert float(jnp.max(jnp.abs(w))) <= limit
    assert float(jnp.std(w)) == pytest.approx(limit / np.sqrt(3), rel=0.1)
