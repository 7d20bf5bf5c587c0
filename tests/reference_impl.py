"""Plain-numpy transcription of the reference model math — the parity
oracle for decagon_tpu tests.

This is an independent re-derivation of the equations in
``/root/reference/decagon/deep/layers.py`` / ``model.py`` /
``optimizer.py`` (TF 1.8 graph code), NOT a copy: dense numpy, no
dropout (tests compare deterministic forwards).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

EdgeType = Tuple[int, int]


def l2norm_rows(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    sq = np.maximum(np.sum(np.square(x), axis=-1, keepdims=True), eps)
    return x / np.sqrt(sq)


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def encoder_forward(
    adjacencies: Dict[EdgeType, List[np.ndarray]],  # normalized dense A_k
    features: Dict[int, np.ndarray],  # dense X per node type
    w1: Dict[EdgeType, List[np.ndarray]],
    w2: Dict[EdgeType, List[np.ndarray]],
    num_types: int,
) -> Dict[int, np.ndarray]:
    """hidden1 then embeddings, per the reference layer/model equations."""
    h1: Dict[int, np.ndarray] = {}
    for i in range(num_types):
        terms = []
        for (a, b), mats in sorted(adjacencies.items()):
            if a != i:
                continue
            per_rel = [
                mats[k] @ (features[b] @ w1[(a, b)][k])
                for k in range(len(mats))
            ]
            terms.append(l2norm_rows(np.sum(per_rel, axis=0)))
        h1[i] = relu(np.sum(terms, axis=0))

    emb: Dict[int, np.ndarray] = {}
    for i in range(num_types):
        terms = []
        for (a, b), mats in sorted(adjacencies.items()):
            if a != i:
                continue
            per_rel = [
                mats[k] @ (h1[b] @ w2[(a, b)][k]) for k in range(len(mats))
            ]
            terms.append(l2norm_rows(np.sum(per_rel, axis=0)))
        emb[i] = np.sum(terms, axis=0)
    return emb


def decoder_score_matrix(
    name: str,
    z_rows: np.ndarray,
    z_cols: np.ndarray,
    glb: np.ndarray = None,
    loc: np.ndarray = None,
) -> np.ndarray:
    """Dense logits ``Z_r loc glb loc Z_c^T`` with decoder-specific
    factors (identity where absent)."""
    d = z_rows.shape[1]
    glb = np.eye(d) if glb is None else glb
    loc = np.eye(d) if loc is None else loc
    return z_rows @ loc @ glb @ loc @ z_cols.T


def normalize_square_dense(a: np.ndarray) -> np.ndarray:
    """Reference preprocess_graph for square inputs, dense."""
    a_ = a + np.eye(a.shape[0])
    d = a_.sum(axis=1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(d), 0.0)
    return (dinv[:, None] * a_.T) * dinv[None, :]


def normalize_rect_dense(a: np.ndarray) -> np.ndarray:
    rd = a.sum(axis=1)
    cd = a.sum(axis=0)
    rinv = np.where(rd > 0, 1.0 / np.sqrt(rd), 0.0)
    cinv = np.where(cd > 0, 1.0 / np.sqrt(cd), 0.0)
    return rinv[:, None] * a * cinv[None, :]
