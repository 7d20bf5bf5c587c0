"""Parity tests: Pallas SDDMM kernel vs the XLA sddmm_pairs path.

Run in interpreter mode on the CPU test mesh (compiled-mode numbers live
in scripts/profile_sddmm.py on the real chip); fp32 HIGHEST precision on
both sides makes exact comparison meaningful.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decagon_tpu.ops.sddmm import sddmm_pairs
from decagon_tpu.ops.sddmm_pallas import sddmm_pallas_edges, supports


def _world(seed=0, n_nodes=97, n_rel=23, d=32, b=1000):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.standard_normal((n_nodes, d)), jnp.float32)
    diag = jnp.asarray(rng.standard_normal((n_rel, d)), jnp.float32)
    glb = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
    ks = jnp.asarray(rng.integers(0, n_rel, b), jnp.int32)
    rows = jnp.asarray(rng.integers(0, n_nodes, b), jnp.int32)
    cols = jnp.asarray(rng.integers(0, n_nodes, b), jnp.int32)
    return z, diag, glb, ks, rows, cols


def _reference(name, z, diag, glb, ks, rows, cols):
    zr, zc = z[rows], z[cols]
    if name == "innerproduct":
        return sddmm_pairs(zr, zc)
    if name == "distmult":
        return sddmm_pairs(zr, zc, glb_diag=diag[ks])
    return sddmm_pairs(zr, zc, glb=glb, loc_diag=diag[ks])


@pytest.mark.parametrize("name", ["innerproduct", "distmult", "dedicom"])
def test_sddmm_pallas_parity(name):
    z, diag, glb, ks, rows, cols = _world()
    got = sddmm_pallas_edges(
        z, z, ks, rows, cols, name=name, glb=glb, rel_diag=diag,
        interpret=True,
    )
    want = _reference(name, z, diag, glb, ks, rows, cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_sddmm_pallas_chunked_shape_and_rect():
    """[n_chunks, C]-shaped indices and distinct row/col tables."""
    rng = np.random.default_rng(3)
    z_r = jnp.asarray(rng.standard_normal((50, 16)), jnp.float32)
    z_c = jnp.asarray(rng.standard_normal((80, 16)), jnp.float32)
    diag = jnp.asarray(rng.standard_normal((7, 16)), jnp.float32)
    glb = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    ks = jnp.asarray(rng.integers(0, 7, (3, 256)), jnp.int32)
    rows = jnp.asarray(rng.integers(0, 50, (3, 256)), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 80, (3, 256)), jnp.int32)
    got = sddmm_pallas_edges(
        z_r, z_c, ks, rows, cols, name="dedicom", glb=glb, rel_diag=diag,
        interpret=True,
    )
    assert got.shape == (3, 256)
    want = sddmm_pairs(
        z_r[rows.reshape(-1)], z_c[cols.reshape(-1)],
        glb=glb, loc_diag=diag[ks.reshape(-1)],
    ).reshape(3, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["distmult", "dedicom"])
def test_sddmm_pallas_bf16_close(name):
    """precision='default' (bf16 MXU passes) stays within bf16 error."""
    z, diag, glb, ks, rows, cols = _world()
    got = sddmm_pallas_edges(
        z, z, ks, rows, cols, name=name, glb=glb, rel_diag=diag,
        interpret=True, precision="default",
    )
    want = _reference(name, z, diag, glb, ks, rows, cols)
    # bf16 mantissa error scales with the bilinear chain's intermediate
    # magnitudes, so tolerance is absolute in units of the score scale
    # (2% of max|score|), not relative per element: rank-order fidelity
    # is what "default" precision promises.
    want_np = np.asarray(want)
    np.testing.assert_allclose(
        np.asarray(got), want_np,
        rtol=5e-2, atol=0.02 * float(np.abs(want_np).max()),
    )


def test_supports_gate():
    assert supports("dedicom", 645, 645, 1926, 32)
    assert not supports("bilinear", 645, 645, 1926, 32)
    assert not supports("dedicom", 19081, 645, 2, 32)  # protein table too big
    assert not supports("dedicom", 645, 645, 1926, 256)  # dim > lane tile


def test_sddmm_pallas_requires_tpu():
    """sddmm_impl='pallas' (compiled) must raise off-TPU instead of
    silently running interpret mode (VERDICT r3 item 7)."""
    import jax
    import pytest as _pytest

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.step import make_emb_scores

    if jax.default_backend() == "tpu":
        _pytest.skip("compiled pallas is legal on TPU")
    graph = make_synthetic_graph(
        n_genes=60, n_drugs=40, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.15, test_frac=0.0, seed=3)
    dg = build_device_graph(graph, splits, edge_pad_multiple=256)
    model = DecagonModel(ModelConfig(sddmm_impl="pallas"), dg)
    with _pytest.raises(ValueError, match="requires a TPU backend"):
        make_emb_scores(model, (1, 1))


def test_evaluator_pallas_sddmm_matches_jnp():
    """AccuracyEvaluator with sddmm_impl='pallas_interpret' (CPU mesh)
    reproduces the jnp path's pooled metrics end to end."""
    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.evaluate import AccuracyEvaluator

    graph = make_synthetic_graph(
        n_genes=100, n_drugs=60, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.15, test_frac=0.1, seed=3)
    dg = build_device_graph(graph, splits, edge_pad_multiple=256)
    params = None
    scores = {}
    for impl in ("jnp", "pallas_interpret"):
        model = DecagonModel(ModelConfig(sddmm_impl=impl), dg)
        if params is None:
            params = model.init_params(jax.random.PRNGKey(0), dg)
        ev = AccuracyEvaluator(model, graph, splits, score_chunk=1024)
        scores[impl] = ev.evaluate_all_drug_drug(params, dg)
    assert scores["pallas_interpret"].auroc == pytest.approx(
        scores["jnp"].auroc, abs=1e-6
    )
    assert scores["pallas_interpret"].auprc == pytest.approx(
        scores["jnp"].auprc, abs=1e-6
    )


def test_sddmm_pallas_bilinear_parity():
    """Bilinear (round 5): the flattened [K, d*d] one-hot gather +
    constant lane expanders reproduce the XLA z_r @ R_k @ z_c scores."""
    rng = np.random.default_rng(7)
    n, k_rel, d, b = 97, 23, 32, 1000
    z = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((k_rel, d, d)), jnp.float32)
    ks = jnp.asarray(rng.integers(0, k_rel, b), jnp.int32)
    rows = jnp.asarray(rng.integers(0, n, b), jnp.int32)
    cols = jnp.asarray(rng.integers(0, n, b), jnp.int32)
    got = sddmm_pallas_edges(
        z, z, ks, rows, cols, name="bilinear", rel_full=rel,
        interpret=True,
    )
    want = sddmm_pairs(z[rows], z[cols], glb=rel[ks])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_sddmm_supports_bilinear_budgets():
    """Paper-scale bilinear fits only at bf16 ("default") precision;
    the diagonal decoders fit either way."""
    assert supports("dedicom", 645, 645, 1926, 32, precision="highest")
    assert not supports(
        "bilinear", 645, 645, 1926, 32, precision="highest"
    )
    assert supports("bilinear", 645, 645, 1926, 32, precision="default")
    assert supports("bilinear", 100, 100, 20, 16, precision="highest")
