"""Checkpointing: params + optimizer state + step, with npy artifact export.

Capability spec: reference ``main/Checkpointer/TensorflowCheckpointer.py``
(save/restore with ``MaxCheckpointsToKeep``, every-N gating via
``BaseCheckpointer.py:4-24``) and the npy export surface used by the
offline predictor (``DecagonLogger._writeAsNdarray``,
``DecagonLogger.py:232-287``; ``CheckpointToNdarrayWriter``): drug
embeddings (``embeddings.npy``), per-relation diagonal importance
matrices (``EmbeddingImportance-<SE>.npy``), and the shared DEDICOM
global interaction matrix (``GlobalRelations.npy``).

Implementation: orbax ``CheckpointManager`` over the train-state pytree.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from decagon_tpu.graph.device import DeviceGraph, etkey


class Checkpointer:
    """Every-N gated orbax checkpointing of the training state."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        every_n_iterations: int = 1,
    ):
        self.directory = os.path.abspath(directory)
        Path(self.directory).mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.every_n = max(1, every_n_iterations)
        self.iterations_done = 0

    def increment_iterations(self) -> None:
        self.iterations_done += 1

    @property
    def should_checkpoint(self) -> bool:
        return (self.iterations_done % self.every_n) == 0

    def save(self, step: int, state: Dict[str, Any]) -> None:
        state = jax.tree_util.tree_map(np.asarray, state)
        self.manager.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(
        self,
        template: Optional[Dict[str, Any]] = None,
        partial: bool = False,
    ) -> Optional[Dict[str, Any]]:
        """Restore the newest checkpoint (``None`` if the directory holds
        none).  With ``partial=True``, ``template`` may cover only a
        subtree of the saved state (e.g. params without optimizer state —
        the offline-export path)."""
        step = self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            template = jax.tree_util.tree_map(np.asarray, template)
            if partial:
                return self.manager.restore(
                    step,
                    args=ocp.args.PyTreeRestore(
                        template, partial_restore=True
                    ),
                )
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def wait(self) -> None:
        self.manager.wait_until_finished()


def export_ndarrays(
    params: Dict,
    embeddings: Dict[str, jax.Array],
    graph: DeviceGraph,
    out_dir: str,
    relation_names: Optional[List[str]] = None,
    drug_type: int = 1,
    node_perms: Optional[Dict[int, np.ndarray]] = None,
) -> None:
    """Write the offline-predictor artifact set.

    ``node_perms``: optional ``{type: old_of_new}`` from
    ``graph.renumber.renumber_by_degree`` — embeddings are restored to
    external row order before writing.
    ``embeddings.npy``: drug-type embeddings [N_drugs, hidden2];
    ``EmbeddingImportance.npz`` + per-relation
    ``EmbeddingImportance-<name>.npy``: per-relation diagonal local
    factors as dense [d, d] matrices; ``GlobalRelations.npy``: the
    DEDICOM global interaction matrix (identity/diag fallback for other
    decoders, matching the (glb, loc) factor semantics of
    ``decagon/deep/model.py:116-137``).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    emb = np.asarray(embeddings[str(drug_type)])
    if node_perms is not None and drug_type in node_perms:
        # Training may run in a renumbered node space (graph/renumber:
        # Pallas occupancy lever); exported rows must be EXTERNAL
        # (sorted-id) order — the offline NpPredictor rebuilds its node
        # lists from the CSVs.
        from decagon_tpu.graph.renumber import restore_external_rows

        emb = restore_external_rows(emb, node_perms[drug_type])
    np.save(out / "embeddings.npy", emb, allow_pickle=False)

    dd_key = etkey((drug_type, drug_type))
    decoder = dict(graph.decoders)[dd_key]
    dec_params = params["dec"][dd_key]
    num_rel = graph.adj[dd_key].num_rel
    dim = np.asarray(embeddings[str(drug_type)]).shape[1]

    if decoder == "dedicom":
        glb = np.asarray(dec_params["global"])
        locs = [np.diag(np.asarray(dec_params["local_diag"][k]))
                for k in range(num_rel)]
    elif decoder == "distmult":
        glb = np.eye(dim, dtype=np.float32)
        locs = [np.diag(np.sqrt(np.abs(np.asarray(dec_params["relation_diag"][k]))))
                for k in range(num_rel)]
    elif decoder == "bilinear":
        # No (diag, glb, diag) factorization exists; export R_k as the
        # "global" per relation with identity importance.
        glb = np.asarray(dec_params["relation"][0])
        locs = [np.eye(dim, dtype=np.float32) for _ in range(num_rel)]
    else:
        glb = np.eye(dim, dtype=np.float32)
        locs = [np.eye(dim, dtype=np.float32) for _ in range(num_rel)]

    np.save(out / "GlobalRelations.npy", glb, allow_pickle=False)
    np.savez(out / "EmbeddingImportance.npz", *locs)
    names = relation_names or [str(k) for k in range(num_rel)]
    for k, name in enumerate(names[:num_rel]):
        np.save(
            out / f"EmbeddingImportance-{name}.npy", locs[k],
            allow_pickle=False,
        )
