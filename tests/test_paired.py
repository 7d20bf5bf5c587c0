"""Paired factored SpMM: build detection, op parity, grad parity,
interpret-mode kernels, and encoder-level equivalence.

The paired contract (ops/spmm_paired.py) must match the plain factored
path bit-for-bit up to bf16 matmul rounding — both run int8-mask bf16
MXU passes with f32 accumulation (capability parity target: reference
``decagon/deep/layers.py:89-90,114``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decagon_tpu.graph.device import build_device_graph, etkey
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.ops import spmm_paired as sp
from decagon_tpu.ops.segment import spmm_dense_factored


def _build(n_genes=80, n_drugs=60, n_dd=3, seed=0, **kw):
    graph = make_synthetic_graph(
        n_genes=n_genes, n_drugs=n_drugs, n_drugdrug_types=n_dd, seed=seed
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.0, seed=1)
    dg = build_device_graph(
        graph, splits, edge_pad_multiple=128,
        dense_factored=True, dense_paired=True, **kw
    )
    return graph, splits, dg


def test_pair_build_detects_transpose_structure():
    _, _, dg = _build()
    for key in ("0,0", "1,1"):
        adj = dg.adj[key]
        assert adj.pair_mask is not None, key
        k = adj.num_rel // 2
        # direct-half masks equal the factored dense_mask's first half,
        # and relation K+k's dense mask is its transpose
        pm = np.asarray(adj.pair_mask)
        dm = np.asarray(adj.dense_mask)
        n = adj.n_rows
        assert pm[:k, :n, :n] == pytest.approx(dm[:k])
        for kk in range(k):
            np.testing.assert_array_equal(dm[k + kk], dm[kk].T)
        # scales rows: (a_e, a_o, b_e, b_o)
        ps = np.asarray(adj.pair_scales)
        rs = np.asarray(adj.row_scale)
        cs = np.asarray(adj.col_scale)
        np.testing.assert_allclose(ps[:k, 0, :n], rs[:k], rtol=1e-6)
        np.testing.assert_allclose(ps[:k, 1, :n], rs[k:], rtol=1e-6)
        np.testing.assert_allclose(ps[:k, 2, :n], cs[:k], rtol=1e-6)
        np.testing.assert_allclose(ps[:k, 3, :n], cs[k:], rtol=1e-6)
    # rectangular edge types never pair
    assert dg.adj["0,1"].pair_mask is None


def test_paired_ref_matches_factored():
    _, _, dg = _build()
    adj = dg.adj["1,1"]
    rng = np.random.default_rng(3)
    two_k, n, h = adj.num_rel, adj.n_rows, 16
    p = rng.standard_normal((two_k, n, h)).astype(np.float32)
    want = spmm_dense_factored(
        jnp.asarray(p), adj.dense_mask, adj.dense_mask_t,
        adj.row_scale, adj.col_scale,
    )
    k = two_k // 2
    got = sp.spmm_paired(
        jnp.asarray(p.transpose(0, 2, 1)).reshape(2, k, h, n),
        adj, impl="paired_ref",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_paired_grad_matches_factored():
    _, _, dg = _build(n_genes=40, n_drugs=30, n_dd=2)
    adj = dg.adj["1,1"]
    rng = np.random.default_rng(4)
    two_k, n, h = adj.num_rel, adj.n_rows, 8
    p = rng.standard_normal((two_k, n, h)).astype(np.float32)
    ct_seed = rng.standard_normal((n, h)).astype(np.float32)

    def loss_fact(p):
        out = spmm_dense_factored(
            p, adj.dense_mask, adj.dense_mask_t,
            adj.row_scale, adj.col_scale,
        )
        return jnp.sum(out * ct_seed)

    def loss_pair(p_t):
        out = sp.spmm_paired(p_t, adj, impl="paired_ref")
        return jnp.sum(out * ct_seed)

    g_fact = jax.grad(loss_fact)(jnp.asarray(p))
    g_pair = jax.grad(loss_pair)(
        jnp.asarray(p.transpose(0, 2, 1)).reshape(2, two_k // 2, h, n)
    )
    np.testing.assert_allclose(
        np.asarray(g_pair).reshape(two_k, h, n).transpose(0, 2, 1),
        np.asarray(g_fact),
        rtol=3e-2, atol=3e-2,
    )


def test_paired_interpret_kernel_matches_ref():
    _, _, dg = _build(n_genes=40, n_drugs=35, n_dd=2)
    adj = dg.adj["1,1"]
    rng = np.random.default_rng(5)
    two_k, n, h = adj.num_rel, adj.n_rows, 8
    k = two_k // 2
    p = rng.standard_normal((two_k, h, n)).astype(np.float32)
    p4 = jnp.asarray(p).reshape(2, k, h, n)
    want = sp.paired_ref(p4, adj.pair_mask, adj.pair_scales)
    got = sp._fwd_call(
        p4, adj.pair_mask, adj.pair_scales, kb=sp.default_kb(k, n),
        interpret=True,
    )[:, :n]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # backward kernel vs the ref vjp
    ct = rng.standard_normal((h, n)).astype(np.float32)
    d_got = sp._bwd_call(
        jnp.asarray(ct), adj.pair_mask, adj.pair_scales, k, h, n,
        kb=sp.default_kb(k, n), interpret=True,
    )
    _, vjp = jax.vjp(
        lambda q: sp.paired_ref(q, adj.pair_mask, adj.pair_scales), p4
    )
    (d_want,) = vjp(jnp.asarray(ct))
    np.testing.assert_allclose(
        np.asarray(d_got, np.float32), np.asarray(d_want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_paired_big_n_blocked_kernel(monkeypatch):
    """Exercise the 2D-blocked big-N variant by shrinking the
    threshold: one pair over a 150-node square type."""
    monkeypatch.setattr(sp, "BIG_N_THRESHOLD", 100)
    monkeypatch.setattr(sp, "BIG_BLOCK", 64)
    graph = make_synthetic_graph(
        n_genes=150, n_drugs=40, n_drugdrug_types=1, seed=2
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.0, seed=1)
    dg = build_device_graph(
        graph, splits, edge_pad_multiple=128, dense_paired=True
    )
    adj = dg.adj["0,0"]
    assert adj.pair_mask is not None
    assert adj.pair_mask.shape[1] % 64 == 0
    rng = np.random.default_rng(6)
    n, h = adj.n_rows, 8
    k = adj.num_rel // 2
    p = rng.standard_normal((adj.num_rel, h, n)).astype(np.float32)
    p4 = jnp.asarray(p).reshape(2, k, h, n)
    want = sp.paired_ref(p4, adj.pair_mask, adj.pair_scales)[:, :n]
    got = sp._fwd_call(p4, adj.pair_mask, adj.pair_scales, kb=1,
                       interpret=True)[:, :n]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    ct = rng.standard_normal((h, n)).astype(np.float32)
    d_got = sp._bwd_call(
        jnp.asarray(ct), adj.pair_mask, adj.pair_scales, k, h, n,
        kb=1, interpret=True,
    )
    _, vjp = jax.vjp(
        lambda q: sp.paired_ref(q, adj.pair_mask, adj.pair_scales), p4
    )
    (d_want,) = vjp(jnp.pad(jnp.asarray(ct), ((0, 0), (0, 0))))
    np.testing.assert_allclose(
        np.asarray(d_got, np.float32),
        np.asarray(d_want, np.float32)[:, :, :, :n],
        rtol=3e-2, atol=3e-2,
    )


def test_paired_encoder_matches_plain_encoder():
    """Deterministic embeddings through the paired path equal the plain
    XLA path given the same (transposed) weights."""
    from decagon_tpu.models.encoder import encode, init_encoder_params

    graph, splits, dg = _build(n_genes=50, n_drugs=40, n_dd=2)
    rng = jax.random.PRNGKey(0)
    params_p = init_encoder_params(rng, dg, 16, 8, spmm_impl="paired")
    # same weights, plain layout ([2, K, H, F] -> [2K, F, H])
    params_x = {
        level: {
            key: (
                jnp.transpose(
                    w.reshape(w.shape[0] * w.shape[1], *w.shape[2:]),
                    (0, 2, 1),
                )
                if key in ("0,0", "1,1")
                else w
            )
            for key, w in params_p[level].items()
        }
        for level in ("enc1", "enc2")
    }
    emb_p = encode(params_p, dg, None, deterministic=True,
                   spmm_impl="paired_ref")
    emb_x = encode(params_x, dg, None, deterministic=True, spmm_impl="xla")
    for t in emb_p:
        np.testing.assert_allclose(
            np.asarray(emb_p[t]), np.asarray(emb_x[t]),
            rtol=3e-2, atol=3e-2,
        )


def test_paired_model_trains_end_to_end():
    """Full Trainer loop through the paired path (ref impl on CPU):
    finite decreasing loss and a working eval."""
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.evaluate import AccuracyEvaluator
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    graph, splits, dg = _build(n_genes=60, n_drugs=50, n_dd=2)
    model = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, spmm_impl="paired"), dg
    )
    cfg = TrainConfig(batch_size=64)
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    losses = []
    for _ in range(2):
        for b in trainer.scheduler.epoch():
            losses.append(float(trainer.train_batch(b)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    scores = AccuracyEvaluator(model, graph, splits).evaluate(
        trainer.params, dg, (1, 1, 0)
    )
    assert 0.0 <= scores.auroc <= 1.0


def test_paired_identity_dropscale_kernel_matches_ref():
    """The identity fast path: raw weights + in-kernel dropout
    keep-scales — interpret-mode kernels (fwd and bwd) against the
    reference math, including the padded-K tail."""
    _, _, dg = _build(n_genes=40, n_drugs=35, n_dd=2)
    adj = dg.adj["1,1"]
    rng = np.random.default_rng(9)
    two_k, n, h = adj.num_rel, adj.n_rows, 8
    k = two_k // 2
    w = jnp.asarray(
        rng.standard_normal((2, k, h, n)).astype(np.float32)
    )
    k8 = adj.pair_scales.shape[0]
    ds_np = np.zeros((k8, 2, adj.pair_scales.shape[2]), np.float32)
    keep = 0.9
    ds_np[:k] = (rng.random((k, 2, n)) < keep) / keep
    ds = jnp.asarray(ds_np)
    want = sp.paired_ref_ds(w, adj.pair_mask, adj.pair_scales, ds)
    got = sp._fwd_call(
        w, adj.pair_mask, adj.pair_scales, ds=ds,
        kb=sp.default_kb(k, n), interpret=True,
    )[:, :n]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # backward: the kernel emits the finished weight gradient
    ct = jnp.asarray(rng.standard_normal((h, n)).astype(np.float32))
    d_got = sp._bwd_call(
        ct, adj.pair_mask, adj.pair_scales, k, h, n,
        kb=sp.default_kb(k, n), ds=ds, out_dtype=jnp.float32,
        interpret=True,
    )
    _, vjp = jax.vjp(
        lambda q: sp.paired_ref_ds(q, adj.pair_mask, adj.pair_scales, ds),
        w,
    )
    (d_want,) = vjp(ct)
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_want), rtol=3e-2, atol=3e-2
    )
