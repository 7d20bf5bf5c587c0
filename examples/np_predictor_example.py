"""Offline-predictor workflow example.

Mirrors reference ``NpPredictorExample/ExampleRunner.py:20-51``: train a
model, export its artifacts, then score a relation's held-out edges from
the dumps alone — including swapping in an externally-learned importance
matrix (the downstream-research hook).

Run: python examples/np_predictor_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from decagon_tpu.data.record import write_heldout_edges_csv
from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.predict.predictor import (
    NpPredictor,
    PredictionsInfo,
    TrainingEdgeIterator,
)
from decagon_tpu.train.checkpoint import export_ndarrays
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer


def main() -> None:
    # 1. Train briefly on the dummy graph.
    graph = make_synthetic_graph(n_genes=200, n_drugs=100,
                                 n_drugdrug_types=2, seed=0)
    splits = split_graph(graph, val_frac=0.05, seed=1)
    dg = build_device_graph(graph, splits)
    model = DecagonModel(ModelConfig(hidden1=32, hidden2=16), dg)
    trainer = Trainer(model, graph, splits, dg,
                      TrainConfig(batch_size=128, scan_chunk=25), seed=0)
    trainer.train(num_epochs=2)

    with tempfile.TemporaryDirectory() as tmp:
        # 2. Export the artifact set + the held-out edge CSV.
        names = [f"C{k:07d}" for k in range(1, 5)]
        emb = model.embeddings(trainer.params, dg, deterministic=True)
        export_ndarrays(trainer.params, emb, dg, tmp, relation_names=names)
        csv_path = write_heldout_edges_csv(
            graph, splits, os.path.join(tmp, "edges.csv"),
            relation_names=names,
        )

        # 3. Score from the dumps alone (no model, pure numpy).
        info = PredictionsInfo(tmp, csv_path,
                               list(range(graph.num_nodes[1])))
        predictor = NpPredictor(info, names[0])
        result = predictor.predict()
        print(f"default importance: AUROC={result.auroc:.3f} "
              f"AUPRC={result.auprc:.3f}")
        print(f"confusion:\n{result.confusion_matrix}")

        # 4. The research hook: swap in an external importance matrix.
        dim = info.embeddings.shape[1]
        custom = np.eye(dim, dtype=np.float32)
        result2 = predictor.predict(importance_matrix=custom)
        print(f"identity importance: AUROC={result2.auroc:.3f}")

        # 5. Iterate training edges (e.g. to fit that external matrix).
        rel = graph.relations[(1, 1)][0]
        it = TrainingEdgeIterator(info, names[0], rel.rows, rel.cols)
        edges = it.get_train_edges()
        stacked = it.get_train_edges_as_embeddings()
        print(f"train edges: {edges.shape}, stacked: {stacked.shape}")


if __name__ == "__main__":
    main()
