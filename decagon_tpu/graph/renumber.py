"""Degree-clustered node renumbering (Pallas SpMM occupancy lever 1).

The tiled SpMM kernel (``ops/spmm_pallas.py``) DMAs CONTIGUOUS source
windows of the flat projected table per tile; occupancy — the fraction
of fetched window bytes that real edges touch — is set by how well
frequently-referenced source nodes cluster in index space.  Random /
insertion-order ids scatter the hot sources (round-4 occupancy 0.357 on
the (1,0) tiling); sorting each node type by TOTAL DEGREE (descending)
concentrates the hot rows at the front, so high-traffic tiles draw from
dense low-index windows (``ops/spmm_pallas.py`` PALLAS_NOTE lever 1).

Renumbering happens at the GRAPH level, before splitting: every
downstream structure (splits, device graph, batches, eval) lives
consistently in the renumbered space, and every eval metric is
permutation-invariant.  The returned ``old_of_new`` permutations map
back to external ids for surfaces with external meaning (npy embedding
exports, STITCH-coded CSVs) — ``apply to a [N, ...] table as
``table[old_of_new_inverse]``... concretely ``export = table_new[new_of_old]``
restores external row order.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from decagon_tpu.graph.container import NodeFeatures, Relation, RelationGraph


def renumber_by_degree(
    graph: RelationGraph,
) -> Tuple[RelationGraph, Dict[int, np.ndarray]]:
    """Relabel each node type by total degree (descending, stable).

    Returns ``(renumbered_graph, perms)`` where ``perms[t][new_id] =
    old_id``.  To restore external row order of a per-node table
    computed in the renumbered space: ``external[old_id] =
    table_new[new_id]``, i.e. ``external = np.empty_like(t);
    external[perms[t]] = table_new``.
    """
    n_types = len(graph.num_nodes)
    deg = [np.zeros(n, np.int64) for n in graph.num_nodes]
    for (i, j), rels in graph.relations.items():
        for rel in rels:
            deg[i] += np.bincount(rel.rows, minlength=graph.num_nodes[i])
            deg[j] += np.bincount(rel.cols, minlength=graph.num_nodes[j])
    perms: Dict[int, np.ndarray] = {}
    new_of_old: List[np.ndarray] = []
    for t in range(n_types):
        order = np.argsort(-deg[t], kind="stable").astype(np.int64)
        perms[t] = order  # old_of_new
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size, dtype=np.int64)
        new_of_old.append(inv)

    relations = {}
    for (i, j), rels in graph.relations.items():
        relations[(i, j)] = [
            Relation(
                rows=new_of_old[i][rel.rows].astype(rel.rows.dtype),
                cols=new_of_old[j][rel.cols].astype(rel.cols.dtype),
                shape=rel.shape,
                name=rel.name,
                transpose_of=rel.transpose_of,
            )
            for rel in rels
        ]
    features = {}
    for t, feat in graph.features.items():
        if feat.kind == "identity":
            # symbolic one-hot: per-node learned rows carry no external
            # order — nothing to permute
            features[t] = feat
        else:
            features[t] = NodeFeatures.from_dense(
                np.asarray(feat.dense)[perms[t]]
            )
    return (
        RelationGraph(
            node_type_names=graph.node_type_names,
            num_nodes=graph.num_nodes,
            relations=relations,
            features=features,
            decoders=dict(graph.decoders),
        ),
        perms,
    )


def restore_external_rows(
    table_new: np.ndarray, old_of_new: np.ndarray
) -> np.ndarray:
    """Map a per-node table from renumbered to external row order
    (embedding exports, ``predict/export.py``)."""
    out = np.empty_like(table_new)
    out[old_of_new] = table_new
    return out
