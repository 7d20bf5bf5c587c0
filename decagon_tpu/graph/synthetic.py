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


def _sample_unique_pairs(
    rng: np.random.RandomState, n: int, size: int
) -> np.ndarray:
    """``size`` unique unordered (a != b) pairs over [0, n), vectorized."""
    size = min(size, n * (n - 1) // 2)
    out = np.empty((0,), dtype=np.int64)
    while out.shape[0] < size:
        need = size - out.shape[0]
        a = rng.randint(0, n, size=2 * need + 16).astype(np.int64)
        b = rng.randint(0, n, size=2 * need + 16).astype(np.int64)
        mask = a != b
        lo = np.minimum(a, b)[mask]
        hi = np.maximum(a, b)[mask]
        out = np.unique(np.concatenate([out, lo * n + hi]))
    out = rng.permutation(out)[:size]
    return np.stack([out // n, out % n], axis=1)


def make_polypharmacy_like_graph(
    n_proteins: int = 2000,
    n_drugs: int = 400,
    n_side_effects: int = 50,
    min_edges_per_relation: int = 64,
    seed: int = 7,
    with_transposes: bool = True,
    drug_decoder: str = "dedicom",
    other_decoder: str = "bilinear",
    total_drugdrug_edges: Optional[int] = None,
    ppi_attachment: int = 5,
    mono_features: bool = False,
    n_mono_side_effects: int = 0,
    planted_rank: int = 0,
    planted_out: Optional[dict] = None,
    planted_noise: float = 0.3,
) -> RelationGraph:
    """A larger random graph shaped like the polypharmacy dataset.

    Used for throughput benchmarking at realistic sizes (BASELINE.json
    configs 2-4) when the public CSVs are unavailable; degree
    distributions are power-law-ish via preferential attachment.

    At paper scale (Zitnik et al. 2018; reference README.md:9-27) pass
    ``n_proteins=19081, n_drugs=645, n_side_effects=963,
    min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
    ppi_attachment=37`` — 963 relations each with >=500 edges (the
    reference's filter at ``DecagonPublicDataAdjacencyMatricesBuilder.py:
    112-125``) and a Pareto-tailed size distribution like the real data.
    """
    rng = np.random.RandomState(seed)

    ppi_graph = nx.barabasi_albert_graph(n_proteins, ppi_attachment, seed=seed)
    ppi = Relation.from_scipy(nx.adjacency_matrix(ppi_graph), name="ppi")

    # protein -> drug targets: each drug hits a handful of proteins
    # (vectorized; duplicates collapsed).
    targets_per_drug = rng.randint(1, 12, size=n_drugs)
    dp_cols = np.repeat(np.arange(n_drugs), targets_per_drug)
    dp_rows = rng.randint(0, n_proteins, size=dp_cols.shape[0])
    dp = np.unique(dp_rows * n_drugs + dp_cols)
    prot_drug = Relation(
        rows=dp // n_drugs, cols=dp % n_drugs,
        shape=(n_proteins, n_drugs), name="protein_drug",
    )

    # Side-effect relation sizes (>= min_edges_per_relation, mirroring the
    # reference's >=500-edge filter).  With total_drugdrug_edges set, a
    # Pareto tail over the floor is rescaled so undirected-pair counts sum
    # to the target (the real data: 4.65M edge instances over 963
    # relations, most near the 500 floor with a heavy tail).
    max_pairs = n_drugs * (n_drugs - 1) // 2
    if total_drugdrug_edges is not None:
        floor = min_edges_per_relation // 2  # pairs (each pair = 2 edges)
        target_pairs = total_drugdrug_edges // 2
        tail = rng.pareto(1.3, size=n_side_effects)
        extra = target_pairs - n_side_effects * floor
        tail = tail / max(tail.sum(), 1e-9) * max(extra, 0)
        sizes = np.minimum(
            (floor + tail).astype(np.int64), max_pairs
        )
    else:
        max_edges = max(
            min_edges_per_relation + 1, (n_drugs * (n_drugs - 1)) // 8
        )
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
    # With ``planted_rank`` > 0 the relations carry learnable structure:
    # each side effect's edges are the top-scoring pairs of a planted
    # low-rank bilinear model score(a, b) = (z_a * d_s) . z_b + noise —
    # exactly the DistMult/DEDICOM family the decoders recover, so
    # quality runs measure learning, not noise.  0 = uniform pairs
    # (structure is irrelevant for throughput benchmarks).
    drug_rels = []
    if planted_rank > 0:
        z = rng.randn(n_drugs, planted_rank) / np.sqrt(planted_rank)
        iu, ju = np.triu_indices(n_drugs, k=1)
        if planted_out is not None:
            # Expose the ground-truth factors so quality analyses can
            # score the ORACLE ceiling of this proxy (the best any
            # DistMult-family learner could do on held-out edges).
            planted_out["z"] = z
            planted_out["d"] = []
    for s, size in enumerate(sizes):
        size = int(min(size, max_pairs))
        if planted_rank > 0:
            d = rng.randn(planted_rank)
            if planted_out is not None:
                planted_out["d"].append(d)
            logits = ((z * d) @ z.T)[iu, ju]
            # ``planted_noise`` sets the proxy's ceiling: the oracle
            # (true factors) scores held-out edges at ~0.856 AUROC at
            # the 0.3 default and ~0.93+ at 0.1 (scripts/
            # oracle_ceiling.py sweeps this).
            logits = logits + planted_noise * rng.randn(logits.shape[0])
            top = np.argpartition(-logits, size - 1)[:size]
            upper = np.stack([iu[top], ju[top]], axis=1)
        else:
            upper = _sample_unique_pairs(rng, n_drugs, size)
        rows = np.concatenate([upper[:, 0], upper[:, 1]])
        cols = np.concatenate([upper[:, 1], upper[:, 0]])
        drug_rels.append(
            Relation(rows=rows, cols=cols, shape=(n_drugs, n_drugs), name=f"se_{s}")
        )

    if mono_features and n_mono_side_effects > 0:
        # Binary drug x mono-side-effect matrix like the real
        # bio-decagon-mono.csv features (~10% fill).
        mono = (rng.rand(n_drugs, n_mono_side_effects) < 0.1).astype(
            np.float32
        )
        drug_features = NodeFeatures.from_dense(mono)
    else:
        drug_features = NodeFeatures.identity(n_drugs)
    graph = RelationGraph(
        node_type_names=("protein", "drug"),
        num_nodes=(n_proteins, n_drugs),
        relations={(0, 0): [ppi], (0, 1): [prot_drug], (1, 1): drug_rels},
        features={
            0: NodeFeatures.identity(n_proteins),
            1: drug_features,
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
