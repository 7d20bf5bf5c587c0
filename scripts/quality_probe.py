"""Quality probe: dummy-graph AUROC under hyperparameter variants."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer


def run(tag, epochs=100, loss="hinge", lr=1e-3, dropout=0.1, margin=0.1,
        val_frac=0.1, test_frac=0.05):
    graph = make_synthetic_graph(
        n_genes=500, n_drugs=400, n_drugdrug_types=3, seed=0
    )
    splits = split_graph(graph, val_frac=val_frac, test_frac=test_frac, seed=1)
    dg = build_device_graph(graph, splits, tile_for_pallas=True)
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=dropout), dg
    )
    cfg = TrainConfig(
        batch_size=512, learning_rate=lr, loss=loss, margin=margin,
        num_epochs=1, scan_chunk=50,
    )
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    ev = AccuracyEvaluator(model, graph, splits)
    t0 = time.time()
    for ep in range(epochs):
        trainer.train(num_epochs=1)
        if (ep + 1) % 20 == 0 or ep + 1 == epochs:
            s = ev.evaluate_all_drug_drug(trainer.params, dg)
            st = ev.evaluate_all_drug_drug(trainer.params, dg, use_test=True)
            print(
                f"[{tag}] ep {ep + 1}: val auroc={s.auroc:.3f} "
                f"test auroc={st.auroc:.3f} auprc={st.auprc:.3f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "base": dict(),
        "xent": dict(loss="xent"),
        "lr3e3": dict(lr=3e-3),
        "nodrop": dict(dropout=0.0),
        "margin0": dict(margin=0.0),
        # Reference protocol: val = 5%, test = 50-edge floor, 50 epochs
        # (minibatch.py:176-177, configuration.json NumEpochs).
        "refproto": dict(val_frac=0.05, test_frac=0.0, epochs=60),
        "refproto-nodrop": dict(
            val_frac=0.05, test_frac=0.0, epochs=60, dropout=0.0
        ),
    }
    for tag, kw in variants.items():
        if which not in ("all", tag):
            continue
        run(tag, **kw)
