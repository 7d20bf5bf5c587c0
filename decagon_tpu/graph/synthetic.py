"""Deterministic synthetic graphs — the CPU-runnable correctness fixture.

Topology parity with the reference's toy data (legacy ``main.py:134-218``
and ``main/DataSetParsers/*/DecagonDummyData*Builder.py``):

* genes: planted-partition graph (``n_genes // 10`` groups of 10,
  p_in=0.2, p_out=0.05, seed=42);
* gene-drug: ``10 * randn(n_genes, n_drugs) > 15`` thresholded;
* drug-drug relation ``i``: symmetric pairs where
  ``(drug_gene @ gene_drug)[d1, d2] == i + 4``;
* layout: ``(0,0): [PPI, PPI^T]``, ``(0,1): [gene_drug]``,
  ``(1,0): [drug_gene]``, ``(1,1): relations + transposes``;
* features: identity for both types; decoders: bilinear everywhere
  except DEDICOM on drug-drug (``main.py:210-215``).
"""

from __future__ import annotations

from typing import Optional

import networkx as nx
import numpy as np

from decagon_tpu.graph.container import NodeFeatures, Relation, RelationGraph


def make_synthetic_graph(
    n_genes: int = 500,
    n_drugs: int = 400,
    n_drugdrug_types: int = 3,
    seed: int = 0,
    partition_seed: int = 42,
    with_transposes: bool = True,
    drug_decoder: str = "dedicom",
    other_decoder: str = "bilinear",
) -> RelationGraph:
    rng = np.random.RandomState(seed)

    gene_net = nx.planted_partition_graph(
        max(1, n_genes // 10), 10, 0.2, 0.05, seed=partition_seed
    )
    n_genes = gene_net.number_of_nodes()
    gene_adj = nx.adjacency_matrix(gene_net)
    ppi = Relation.from_scipy(gene_adj, name="ppi")

    gene_drug_dense = (10 * rng.randn(n_genes, n_drugs) > 15).astype(np.int8)
    gene_drug = Relation.from_dense(gene_drug_dense, name="gene_drug")

    # Drug-drug relations from shared-target counts.  At small sizes the
    # exact-overlap criterion can leave a relation nearly empty, so thin
    # relations are topped up with seeded random symmetric pairs to stay
    # usable as fixtures (the reference sizes, 500x400, are always dense
    # enough for the original criterion alone).
    overlap = gene_drug_dense.astype(np.int64).T @ gene_drug_dense.astype(np.int64)
    drug_rels = []
    min_edges = max(8, 4 * (n_drugs // 10))
    for i in range(n_drugdrug_types):
        hits = (overlap == i + 4)
        np.fill_diagonal(hits, False)
        sym = hits | hits.T
        while int(sym.sum()) < 2 * min_edges:
            a, b = rng.randint(0, n_drugs, size=2)
            if a != b:
                sym[a, b] = sym[b, a] = True
        drug_rels.append(Relation.from_dense(sym, name=f"dd_{i}"))

    relations = {
        (0, 0): [ppi],
        (0, 1): [gene_drug],
        (1, 1): drug_rels,
    }
    graph = RelationGraph(
        node_type_names=("gene", "drug"),
        num_nodes=(n_genes, n_drugs),
        relations=relations,
        features={
            0: NodeFeatures.identity(n_genes),
            1: NodeFeatures.identity(n_drugs),
        },
        decoders={
            (0, 0): other_decoder,
            (0, 1): other_decoder,
            (1, 0): other_decoder,
            (1, 1): drug_decoder,
        },
    )
    if with_transposes:
        graph = graph.with_transposes()
    return graph


def make_polypharmacy_like_graph(
    n_proteins: int = 2000,
    n_drugs: int = 400,
    n_side_effects: int = 50,
    min_edges_per_relation: int = 64,
    seed: int = 7,
    with_transposes: bool = True,
    drug_decoder: str = "dedicom",
    other_decoder: str = "bilinear",
) -> RelationGraph:
    """A larger random graph shaped like the polypharmacy dataset.

    Used for throughput benchmarking at realistic sizes (BASELINE.json
    configs 2-4) when the public CSVs are unavailable; degree
    distributions are power-law-ish via preferential attachment.
    """
    rng = np.random.RandomState(seed)

    ppi_graph = nx.barabasi_albert_graph(n_proteins, 5, seed=seed)
    ppi = Relation.from_scipy(nx.adjacency_matrix(ppi_graph), name="ppi")

    # protein -> drug targets: each drug hits a handful of proteins.
    targets_per_drug = rng.randint(1, 12, size=n_drugs)
    dp_rows, dp_cols = [], []
    for d in range(n_drugs):
        prots = rng.choice(n_proteins, size=targets_per_drug[d], replace=False)
        dp_rows.extend(prots)
        dp_cols.extend([d] * len(prots))
    prot_drug = Relation(
        rows=np.array(dp_rows), cols=np.array(dp_cols),
        shape=(n_proteins, n_drugs), name="protein_drug",
    )

    # Side-effect relations with log-spread sizes (>= min_edges_per_relation,
    # mirroring the reference's >=500-edge filter on the real data).
    drug_rels = []
    max_edges = max(min_edges_per_relation + 1, (n_drugs * (n_drugs - 1)) // 8)
    sizes = np.unique(
        np.round(
            np.exp(
                rng.uniform(
                    np.log(min_edges_per_relation), np.log(max_edges),
                    size=n_side_effects,
                )
            )
        ).astype(int)
    )
    sizes = rng.choice(sizes, size=n_side_effects, replace=True)
    for s, size in enumerate(sizes):
        upper = np.empty((size, 2), dtype=np.int64)
        seen = set()
        filled = 0
        while filled < size:
            a, b = rng.randint(0, n_drugs, size=2)
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            if key in seen:
                continue
            seen.add(key)
            upper[filled] = key
            filled += 1
        rows = np.concatenate([upper[:, 0], upper[:, 1]])
        cols = np.concatenate([upper[:, 1], upper[:, 0]])
        drug_rels.append(
            Relation(rows=rows, cols=cols, shape=(n_drugs, n_drugs), name=f"se_{s}")
        )

    graph = RelationGraph(
        node_type_names=("protein", "drug"),
        num_nodes=(n_proteins, n_drugs),
        relations={(0, 0): [ppi], (0, 1): [prot_drug], (1, 1): drug_rels},
        features={
            0: NodeFeatures.identity(n_proteins),
            1: NodeFeatures.identity(n_drugs),
        },
        decoders={
            (0, 0): other_decoder,
            (0, 1): other_decoder,
            (1, 0): other_decoder,
            (1, 1): drug_decoder,
        },
    )
    if with_transposes:
        graph = graph.with_transposes()
    return graph
