"""Public polypharmacy dataset parsers (bio-decagon CSV family).

Parity spec: reference ``main/DataSetParsers/**`` for DecagonPublicData:

* node lists: drugs = union of combo-file drugs and target-file ``CID``-
  prefixed nodes; proteins = union of PPI nodes and target-file non-CID
  nodes; both sorted ascending by integer ID
  (``DecagonPublicDataNodeListsBuilder.py:37-77``);
* drug-drug relations: one symmetric adjacency per side effect, filtered
  to >= 500 raw edges
  (``DecagonPublicDataAdjacencyMatricesBuilder.py:112-125``);
* protein x drug target matrix (protein-major, edge type (0, 1) —
  ``:127-136``) and the symmetric PPI matrix;
* features: proteins identity; drugs = binary drug x mono-side-effect
  matrix (``DecagonPublicDataNodeFeaturesBuilder.py:31-51``);
* decoders: bilinear everywhere, DEDICOM on drug-drug
  (``configuration.json``).

Parsing is plain ``csv`` (no networkx on this path — the files run to
millions of rows); header rows are skipped automatically.
"""

from __future__ import annotations

import csv
import dataclasses
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

from decagon_tpu.graph.container import (
    NodeFeatures,
    Relation,
    RelationGraph,
)
from decagon_tpu.graph.ids import DrugId, ProteinId, SideEffectId

# Per-side-effect dataset variants from the reference
# (NeutropeniaAdjMtxBuilder.py:5-11 etc.).
NAMED_SIDE_EFFECTS = {
    "neutropenia": 27947,
    "hyperglycaemia": 20456,
    "anosmia": 3126,
}


def _read_rows(path: str, min_cols: int) -> Iterable[List[str]]:
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if len(row) < min_cols:
                continue
            yield row


def _is_header(row: List[str]) -> bool:
    return not any(ch.isdigit() for ch in row[0])


@dataclasses.dataclass
class PublicDataset:
    """Parsed dataset: the graph plus the external-ID orderings that
    downstream components (predictor, recorded-edge CSVs) need."""

    graph: RelationGraph
    protein_ids: List[int]
    drug_ids: List[int]
    relation_names: List[str]  # side-effect external IDs, graph order


def load_public_dataset(
    combo_path: str,
    ppi_path: str,
    targets_path: str,
    mono_path: Optional[str] = None,
    min_edges_per_relation: int = 500,
    relation_allowlist: Optional[Set[int]] = None,
    drug_decoder: str = "dedicom",
    other_decoder: str = "bilinear",
    with_transposes: bool = True,
) -> PublicDataset:
    # ---- raw parses -------------------------------------------------------
    combo_edges: Dict[int, List[Tuple[int, int]]] = defaultdict(list)
    combo_drugs: Set[int] = set()
    for row in _read_rows(combo_path, 3):
        if _is_header(row):
            continue
        a, b = int(DrugId(row[0])), int(DrugId(row[1]))
        rel = int(SideEffectId(row[2]))
        combo_edges[rel].append((a, b))
        combo_drugs.add(a)
        combo_drugs.add(b)

    ppi_edges: List[Tuple[int, int]] = []
    ppi_proteins: Set[int] = set()
    for row in _read_rows(ppi_path, 2):
        if _is_header(row):
            continue
        a, b = int(ProteinId(row[0])), int(ProteinId(row[1]))
        ppi_edges.append((a, b))
        ppi_proteins.add(a)
        ppi_proteins.add(b)

    target_edges: List[Tuple[int, int]] = []  # (drug, protein)
    target_drugs: Set[int] = set()
    target_proteins: Set[int] = set()
    for row in _read_rows(targets_path, 2):
        if _is_header(row):
            continue
        drug_col = 0 if row[0].startswith("CID") else 1
        drug = int(DrugId(row[drug_col]))
        protein = int(ProteinId(row[1 - drug_col]))
        target_edges.append((drug, protein))
        target_drugs.add(drug)
        target_proteins.add(protein)

    # ---- node orderings (sorted integer IDs) ------------------------------
    drug_ids = sorted(combo_drugs | target_drugs)
    protein_ids = sorted(ppi_proteins | target_proteins)
    drug_idx = {d: i for i, d in enumerate(drug_ids)}
    protein_idx = {p: i for i, p in enumerate(protein_ids)}
    n_drugs, n_proteins = len(drug_ids), len(protein_ids)

    # ---- relations ---------------------------------------------------------
    def symmetric_relation(
        pairs: Sequence[Tuple[int, int]],
        index: Dict[int, int],
        n: int,
        name: str,
    ) -> Relation:
        rows, cols = [], []
        seen = set()
        for a, b in pairs:
            ia, ib = index[a], index[b]
            if ia == ib:
                continue
            key = (ia, ib) if ia < ib else (ib, ia)
            if key in seen:
                continue
            seen.add(key)
            rows.extend((key[0], key[1]))
            cols.extend((key[1], key[0]))
        return Relation(
            rows=np.asarray(rows, np.int32),
            cols=np.asarray(cols, np.int32),
            shape=(n, n),
            name=name,
        )

    drug_relations: List[Relation] = []
    for rel_id in sorted(combo_edges):
        edges = combo_edges[rel_id]
        if len(edges) < min_edges_per_relation:
            continue
        if relation_allowlist is not None and rel_id not in relation_allowlist:
            continue
        drug_relations.append(
            symmetric_relation(
                edges, drug_idx, n_drugs,
                name=SideEffectId(rel_id).to_external(),
            )
        )
    if not drug_relations:
        raise ValueError(
            "no drug-drug relation passed the "
            f">={min_edges_per_relation}-edge filter"
        )

    ppi = symmetric_relation(ppi_edges, protein_idx, n_proteins, name="ppi")

    pd_rows = np.asarray(
        [protein_idx[p] for _, p in target_edges], np.int32
    )
    pd_cols = np.asarray([drug_idx[d] for d, _ in target_edges], np.int32)
    dedup = {}
    for r, c in zip(pd_rows, pd_cols):
        dedup[(int(r), int(c))] = None
    pd_pairs = np.asarray(list(dedup.keys()), np.int32).reshape(-1, 2)
    protein_drug = Relation(
        rows=pd_pairs[:, 0],
        cols=pd_pairs[:, 1],
        shape=(n_proteins, n_drugs),
        name="protein_drug",
    )

    # ---- features ----------------------------------------------------------
    if mono_path is not None:
        mono: Dict[int, List[int]] = defaultdict(list)
        side_effects: Set[int] = set()
        for row in _read_rows(mono_path, 2):
            if _is_header(row):
                continue
            drug = int(DrugId(row[0]))
            se = int(SideEffectId(row[1]))
            mono[drug].append(se)
            side_effects.add(se)
        se_idx = {se: i for i, se in enumerate(sorted(side_effects))}
        feats = np.zeros((n_drugs, len(se_idx)), dtype=np.float32)
        for drug, ses in mono.items():
            if drug not in drug_idx:
                continue
            for se in ses:
                feats[drug_idx[drug], se_idx[se]] = 1.0
        drug_features = NodeFeatures.from_dense(feats)
    else:
        drug_features = NodeFeatures.identity(n_drugs)

    graph = RelationGraph(
        node_type_names=("protein", "drug"),
        num_nodes=(n_proteins, n_drugs),
        relations={
            (0, 0): [ppi],
            (0, 1): [protein_drug],
            (1, 1): drug_relations,
        },
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
    return PublicDataset(
        graph=graph,
        protein_ids=protein_ids,
        drug_ids=drug_ids,
        relation_names=[rel.name for rel in drug_relations],
    )


def load_public_graph(*args, **kwargs) -> RelationGraph:
    """Graph-only convenience wrapper around ``load_public_dataset``."""
    return load_public_dataset(*args, **kwargs).graph


__all__ = ["load_public_dataset", "load_public_graph", "NAMED_SIDE_EFFECTS"]
