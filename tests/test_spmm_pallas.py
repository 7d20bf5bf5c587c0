"""Pallas tiled-SpMM kernel tests (interpret mode on CPU).

Real-chip numerics and throughput are exercised by bench.py /
benchmarks/spmm_bench.py; these tests pin down the tiling logic and the
kernel math (forward + custom-VJP backward) against the XLA reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.ops.segment import spmm_segment
from decagon_tpu.ops.spmm_pallas import _spmm_pallas_op, spmm_tiled
from decagon_tpu.ops.tiling import build_tiles, tiling_stats


@pytest.mark.parametrize("shape", [(2, 100, 80, 5000), (5, 37, 61, 900)])
def test_tiled_spmm_matches_dense(shape):
    k, n_src, n_dst, e = shape
    rng = np.random.default_rng(0)
    src = rng.integers(0, k * n_src, e)
    dst = rng.integers(0, n_dst, e)
    vals = rng.normal(size=e).astype(np.float32)
    h = 32
    pf = rng.normal(size=(k * n_src, h)).astype(np.float32)

    tiles = build_tiles(src, dst, vals, k * n_src, n_dst, 64, 64, 64)
    stats = tiling_stats(tiles)
    assert stats["nnz"] == e

    want = np.zeros((n_dst, h), np.float32)
    np.add.at(want, dst, vals[:, None] * pf[src])
    got = np.asarray(spmm_tiled(jnp.asarray(pf), tiles, interpret=True))
    np.testing.assert_allclose(got[:n_dst, :h], want, atol=1e-4)
    # Padded rows must be exactly zero.
    assert np.all(got[n_dst:] == 0.0)


def test_tiled_spmm_gradient_matches_xla():
    k, n_src, n_dst, e, h = 3, 50, 40, 700, 16
    rng = np.random.default_rng(1)
    src = rng.integers(0, k * n_src, e)
    dst = rng.integers(0, n_dst, e)
    vals = rng.normal(size=e).astype(np.float32)
    p = jnp.asarray(rng.normal(size=(k, n_src, h)).astype(np.float32))

    tiles_f = build_tiles(src, dst, vals, k * n_src, n_dst, 64, 64, 64)
    tiles_b = build_tiles(dst, src, vals, n_dst, k * n_src, 64, 64, 64)

    def f_pallas(p_stack):
        out = _spmm_pallas_op(p_stack, tiles_f, tiles_b, n_dst, True, "highest")
        return jnp.sum(jnp.tanh(out))

    def f_xla(p_stack):
        out = spmm_segment(
            p_stack,
            jnp.asarray(src % n_src, jnp.int32),
            jnp.asarray(dst, jnp.int32),
            jnp.asarray(src // n_src, jnp.int32),
            jnp.asarray(vals),
            n_dst,
        )
        return jnp.sum(jnp.tanh(out))

    np.testing.assert_allclose(
        float(f_pallas(p)), float(f_xla(p)), rtol=1e-5
    )
    g_pallas = jax.grad(f_pallas)(p)
    g_xla = jax.grad(f_xla)(p)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=1e-4
    )


def test_encoder_with_pallas_spmm_matches_xla():
    graph = make_synthetic_graph(
        n_genes=60, n_drugs=30, n_drugdrug_types=1, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, edge_pad_multiple=256,
        tile_for_pallas=True, tile_block=64, tile_even_if_dense=True,
    )
    model_x = DecagonModel(ModelConfig(hidden1=16, hidden2=8), dg)
    params = model_x.init_params(jax.random.PRNGKey(0), dg)
    emb_x = model_x.embeddings(params, dg, deterministic=True)

    model_p = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, spmm_impl="pallas_interpret"), dg
    )
    emb_p = model_p.embeddings(params, dg, deterministic=True)
    for key in emb_x:
        np.testing.assert_allclose(
            np.asarray(emb_p[key]), np.asarray(emb_x[key]), atol=1e-4
        )


def test_empty_relation_tiling():
    tiles = build_tiles(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.float32), 64, 64, 64, 64, 64,
    )
    out = np.asarray(
        spmm_tiled(jnp.zeros((64, 16)), tiles, interpret=True)
    )
    assert np.all(out == 0.0)


def test_dense_spmm_matches_segment():
    """The densified MXU path (small-relation auto-dispatch) must equal
    the gather+segment-sum aggregation exactly."""
    from decagon_tpu.ops.segment import spmm, spmm_dense

    graph = make_synthetic_graph(
        n_genes=50, n_drugs=30, n_drugdrug_types=2, seed=3
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=4)
    dg = build_device_graph(graph, splits, edge_pad_multiple=128)
    rng = np.random.default_rng(0)
    for key, adj in dg.adj.items():
        assert adj.dense is not None  # tiny graph: everything densifies
        p = jnp.asarray(
            rng.normal(size=(adj.num_rel, adj.n_cols, 16)), jnp.float32
        )
        want = spmm(p, adj, impl="xla")
        got = spmm(p, adj, impl="dense")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )
        # nnz parity: the dense stack holds exactly the normalized edges.
        assert int(jnp.count_nonzero(adj.dense)) == int(
            jnp.count_nonzero(adj.vals)
        )


def test_densify_threshold_gates_materialization():
    graph = make_synthetic_graph(
        n_genes=50, n_drugs=30, n_drugdrug_types=2, seed=3
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=4)
    dg = build_device_graph(
        graph, splits, edge_pad_multiple=128, densify_max_cells=100
    )
    assert all(a.dense is None for a in dg.adj.values())


def test_tiled_spmm_bf16_windows_close():
    """precision DEFAULT stores the source table as bf16 in HBM (lever 3:
    half the dominant window DMA); results stay within bf16 rounding of
    the fp32 kernel."""
    k, n_src, n_dst, e, h = 3, 64, 48, 1200, 32
    rng = np.random.default_rng(7)
    src = rng.integers(0, k * n_src, e)
    dst = rng.integers(0, n_dst, e)
    vals = rng.normal(size=e).astype(np.float32)
    pf = rng.normal(size=(k * n_src, h)).astype(np.float32)
    tiles = build_tiles(src, dst, vals, k * n_src, n_dst, 32, 32, 32)
    exact = np.asarray(
        spmm_tiled(jnp.asarray(pf), tiles, interpret=True)
    )[:n_dst]
    fast = np.asarray(
        spmm_tiled(
            jnp.asarray(pf), tiles, interpret=True,
            precision=jax.lax.Precision.DEFAULT,
        )
    )[:n_dst]
    scale = np.abs(exact).max()
    np.testing.assert_allclose(
        fast, exact, rtol=3e-2, atol=0.02 * max(scale, 1e-6)
    )
