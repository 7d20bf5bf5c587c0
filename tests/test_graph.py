"""Graph container, IDs, normalization, and splitting tests."""

import numpy as np
import pytest

from decagon_tpu.graph.container import NodeFeatures, Relation, RelationGraph
from decagon_tpu.graph.ids import DrugId, ProteinId, SideEffectId
from decagon_tpu.graph.normalize import normalize_rect, normalize_square
from decagon_tpu.graph.split import split_graph, split_relation
from decagon_tpu.graph.synthetic import make_synthetic_graph

from tests.reference_impl import normalize_rect_dense, normalize_square_dense


def test_stitch_id_roundtrip():
    assert int(DrugId("CID000012314")) == 12314
    assert DrugId(12314).to_external() == "CID000012314"
    assert int(SideEffectId("C0026780")) == 26780
    assert SideEffectId(26780).to_external() == "C0026780"
    assert int(ProteinId("5297")) == 5297
    assert ProteinId("5297").to_external() == "5297"
    assert int(DrugId("CID000012310")) == 12310  # reference bug not reproduced


def test_synthetic_graph_shape():
    g = make_synthetic_graph(n_genes=100, n_drugs=40, n_drugdrug_types=2, seed=0)
    assert g.num_nodes == (100, 40)
    ets = g.edge_types
    assert ets[(0, 0)] == 2  # ppi + transpose
    assert ets[(0, 1)] == 1
    assert ets[(1, 0)] == 1
    assert ets[(1, 1)] == 4  # 2 relations + transposes
    # transpose links present and edges actually flipped
    t = g.relations[(0, 0)][1]
    assert t.transpose_of == (0, 0, 0)
    orig = g.relations[(0, 0)][0]
    assert set(map(tuple, t.edges)) == {(c, r) for r, c in orig.edges}
    # drug-gene is transpose of gene-drug
    dg = g.relations[(1, 0)][0]
    assert dg.transpose_of == (0, 1, 0)


def test_degrees_from_square_relations():
    g = make_synthetic_graph(n_genes=100, n_drugs=40, n_drugdrug_types=2, seed=0)
    degs = g.degrees()
    ppi = g.relations[(0, 0)][0]
    expected = np.bincount(ppi.cols, minlength=100)
    np.testing.assert_array_equal(degs[0][0], expected)
    assert len(degs[1]) == 4  # per drug-drug relation incl. transposes


def test_normalize_square_matches_dense_reference():
    rng = np.random.default_rng(0)
    n = 30
    dense = (rng.random((n, n)) < 0.15).astype(np.float64)
    np.fill_diagonal(dense, 0)
    rows, cols = np.nonzero(dense)
    out_r, out_c, out_v = normalize_square(rows, cols, n)
    got = np.zeros((n, n))
    got[out_r, out_c] = out_v
    np.testing.assert_allclose(got, normalize_square_dense(dense), atol=1e-6)


def test_normalize_rect_matches_dense_reference():
    rng = np.random.default_rng(1)
    dense = (rng.random((20, 12)) < 0.2).astype(np.float64)
    rows, cols = np.nonzero(dense)
    out_r, out_c, out_v = normalize_rect(rows, cols, (20, 12))
    got = np.zeros((20, 12))
    got[out_r, out_c] = out_v
    np.testing.assert_allclose(got, normalize_rect_dense(dense), atol=1e-6)


def test_split_relation_invariants():
    rng = np.random.default_rng(2)
    n = 80
    dense = (rng.random((n, n)) < 0.3).astype(int)
    np.fill_diagonal(dense, 0)
    rows, cols = np.nonzero(dense)
    edges = np.stack([rows, cols], axis=1)
    split = split_relation(edges, (n, n), val_frac=0.1, test_frac=0.05,
                           rng=np.random.default_rng(3))
    total = len(split.train) + len(split.val) + len(split.test)
    assert total == len(edges)
    assert len(split.val) == max(50, int(len(edges) * 0.1))
    assert len(split.test) == max(50, int(len(edges) * 0.05))
    # negatives: right count, never true edges, no duplicates
    for neg in (split.val_false, split.test_false):
        assert {(r, c) for r, c in neg}.isdisjoint(
            {(r, c) for r, c in edges}
        )
    assert len(split.val_false) == len(split.val)
    assert len(split.test_false) == len(split.test)
    assert len({(r, c) for r, c in split.val_false}) == len(split.val_false)
    # no overlap between train/val/test positives
    sets = [set(map(tuple, s)) for s in (split.train, split.val, split.test)]
    assert not (sets[0] & sets[1]) and not (sets[0] & sets[2])


def test_split_graph_transpose_sharing():
    g = make_synthetic_graph(n_genes=120, n_drugs=50, n_drugdrug_types=2, seed=0)
    splits = split_graph(g, val_frac=0.1, test_frac=0.05, seed=11)
    base = splits[(0, 0, 0)]
    tposed = splits[(0, 0, 1)]
    np.testing.assert_array_equal(base.val[:, 0], tposed.val[:, 1])
    np.testing.assert_array_equal(base.val[:, 1], tposed.val[:, 0])
    np.testing.assert_array_equal(base.train[:, 0], tposed.train[:, 1])
    # normalized adjacency of the transpose is the flipped COO of the base
    np.testing.assert_array_equal(np.sort(base.adj_rows), np.sort(tposed.adj_cols))
    np.testing.assert_allclose(np.sort(base.adj_vals), np.sort(tposed.adj_vals))
    # drug-gene shares with gene-drug across edge types
    gd, dg = splits[(0, 1, 0)], splits[(1, 0, 0)]
    np.testing.assert_array_equal(gd.val[:, 0], dg.val[:, 1])


def test_split_graph_precomputed_holdout():
    g = make_synthetic_graph(n_genes=100, n_drugs=60, n_drugdrug_types=1, seed=0)
    rel = g.relations[(1, 1)][0]
    pos = rel.edges[:10]
    neg = np.array([[0, 1], [2, 3]], dtype=np.int32)
    splits = split_graph(
        g, val_frac=0.1, seed=5,
        precomputed_holdout={0: {"positive": pos, "negative": neg}},
    )
    s = splits[(1, 1, 0)]
    np.testing.assert_array_equal(s.val, pos)
    np.testing.assert_array_equal(s.val_false, neg)
    assert len(s.test) == 0
    assert len(s.train) == rel.num_edges  # all edges train


def test_masked_graph():
    g = make_synthetic_graph(n_genes=100, n_drugs=40, n_drugdrug_types=1, seed=0)
    rel = g.relations[(1, 1)][0]
    mask = np.zeros(rel.num_edges, dtype=bool)
    mask[: rel.num_edges // 2] = True
    masked = g.masked({(1, 1, 0): mask})
    assert masked.relations[(1, 1)][0].num_edges == rel.num_edges // 2
    assert masked.relations[(0, 0)][0].num_edges == g.relations[(0, 0)][0].num_edges


def test_dense_bf16_spmm_close_to_f32():
    """bf16 dense stacks (the paper-scale memory-bound path) stay within
    bf16 rounding of the exact fp32 segment-sum aggregation."""
    import jax.numpy as jnp

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.ops.segment import spmm

    graph = make_synthetic_graph(
        n_genes=60, n_drugs=30, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=1)
    dg32 = build_device_graph(graph, splits)
    dg16 = build_device_graph(graph, splits, dense_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for key, adj in dg32.adj.items():
        p = jnp.asarray(
            rng.standard_normal((adj.num_rel, adj.n_cols, 16)), jnp.float32
        )
        want = np.asarray(spmm(p, adj, impl="xla"))
        got = np.asarray(spmm(p, dg16.adj[key], impl="dense"))
        scale = np.abs(want).max() + 1e-6
        assert np.max(np.abs(got - want)) / scale < 2e-2


def test_polypharmacy_generator_edge_budget():
    """Paper-scale knobs: relation sizes respect the >=min floor and sum
    close to the requested total (Pareto tail)."""
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph

    graph = make_polypharmacy_like_graph(
        n_proteins=300, n_drugs=120, n_side_effects=40,
        min_edges_per_relation=20, total_drugdrug_edges=40_000,
        with_transposes=False, seed=3,
    )
    sizes = np.array(
        [r.rows.shape[0] for r in graph.relations[(1, 1)]]
    )
    assert len(sizes) == 40
    assert sizes.min() >= 20
    assert abs(sizes.sum() - 40_000) / 40_000 < 0.25
    # Symmetric storage: every edge has its mirror.
    rel = graph.relations[(1, 1)][0]
    pairs = {(int(r), int(c)) for r, c in zip(rel.rows, rel.cols)}
    assert all((c, r) in pairs for r, c in pairs)


def test_renumber_by_degree_preserves_graph():
    """Degree renumbering (ops/spmm_pallas occupancy lever): edges map
    bijectively, degrees are descending per type, dense features follow
    their nodes, and restore_external_rows inverts the permutation."""
    import numpy as np

    from decagon_tpu.graph.renumber import (
        renumber_by_degree,
        restore_external_rows,
    )
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph

    graph = make_polypharmacy_like_graph(
        n_proteins=150, n_drugs=60, n_side_effects=4, seed=3,
        mono_features=True, n_mono_side_effects=20,
    )
    new, perms = renumber_by_degree(graph)
    assert new.num_nodes == graph.num_nodes
    # per-type degree descending in the NEW numbering
    for t in range(2):
        deg = np.zeros(new.num_nodes[t], np.int64)
        for (i, j), rels in new.relations.items():
            for rel in rels:
                if i == t:
                    deg += np.bincount(rel.rows, minlength=len(deg))
                if j == t:
                    deg += np.bincount(rel.cols, minlength=len(deg))
        assert (np.diff(deg) <= 0).all(), t
    # edge sets are the same graph under the permutation
    for (i, j) in graph.relations:
        for old_rel, new_rel in zip(
            graph.relations[(i, j)], new.relations[(i, j)]
        ):
            old_edges = set(
                zip(old_rel.rows.tolist(), old_rel.cols.tolist())
            )
            mapped = set(
                zip(
                    perms[i][new_rel.rows].tolist(),
                    perms[j][new_rel.cols].tolist(),
                )
            )
            assert old_edges == mapped, (i, j)
    # dense drug features rode along with their nodes
    np.testing.assert_array_equal(
        np.asarray(new.features[1].dense),
        np.asarray(graph.features[1].dense)[perms[1]],
    )
    # export-side inverse: a per-node table computed in the new space
    # restores to external row order
    table_new = np.arange(new.num_nodes[1] * 3).reshape(-1, 3)
    ext = restore_external_rows(table_new, perms[1])
    np.testing.assert_array_equal(ext[perms[1]], table_new)
