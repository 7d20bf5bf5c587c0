"""Quality-delta ablation on the dummy config (VERDICT r2 item 4).

The round-2 dummy run plateaued at pooled test AUROC ~0.75 after 200
epochs, against the reference's recorded 0.741-0.834 per-edge-type band
at 50 epochs (/root/reference/theirBadResults.txt).  This script chases
the documented implementation divergences experimentally: each variant
trains the SAME dummy graph/hparams and records the val/test AUROC
trajectory, so the cost of each divergence is measured rather than
guessed.

Variants:
  base       — round-2 configuration (dense optax Adam, hinge).
  lazy_adam  — TF1-parity lazy (row-masked) Adam moments on decoder rows
               (reference optimizer.py:111-114 + TF1 _apply_sparse;
               divergence documented at train/step.py).
  xent       — sigmoid cross-entropy loss (reference optimizer.py:110
               built it; call site used hinge).
  lr_3e3     — 3x learning rate (convergence-speed check: is the gap a
               calibration constant?).

Writes artifacts/quality/ablation.json and per-variant metric CSVs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "quality",
)

VARIANTS = {
    "base": {},
    "lazy_adam": {"lazy_decoder_adam": True},
    "xent": {"loss": "xent"},
    "lr_3e3": {"learning_rate": 3e-3},
}


def run_variant(name: str, overrides: dict, max_epochs: int = 150,
                eval_every: int = 10, seed: int = 0) -> dict:
    graph = make_synthetic_graph(
        n_genes=500, n_drugs=400, n_drugdrug_types=3, seed=0
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.0, seed=seed + 1)
    dg = build_device_graph(graph, splits, build_fused=False)
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="auto"),
        dg,
    )
    kwargs = dict(
        batch_size=512, learning_rate=1e-3, loss="hinge", margin=0.1,
        num_epochs=1, scan_chunk=50,
    )
    kwargs.update(overrides)
    cfg = TrainConfig(**kwargs)
    trainer = Trainer(model, graph, splits, dg, cfg, seed=seed)
    evaluator = AccuracyEvaluator(model, graph, splits)
    t0 = time.time()
    trajectory = []
    for epoch in range(1, max_epochs + 1):
        trainer.train(num_epochs=1)
        if epoch % eval_every and epoch != max_epochs:
            continue
        emb = evaluator.embeddings(trainer.params, dg)
        val = evaluator.evaluate_all_drug_drug(
            trainer.params, dg, embeddings=emb
        )
        test = evaluator.evaluate_all_drug_drug(
            trainer.params, dg, use_test=True, embeddings=emb
        )
        trajectory.append(
            {"epoch": epoch, "val_auroc": round(val.auroc, 5),
             "test_auroc": round(test.auroc, 5),
             "test_auprc": round(test.auprc, 5)}
        )
        print(
            f"[{name}] epoch {epoch}: val {val.auroc:.4f} "
            f"test {test.auroc:.4f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
    best = max(t["test_auroc"] for t in trajectory)
    at50 = max(
        (t["test_auroc"] for t in trajectory if t["epoch"] <= 50),
        default=float("nan"),
    )
    at100 = max(
        (t["test_auroc"] for t in trajectory if t["epoch"] <= 100),
        default=float("nan"),
    )
    return {
        "trajectory": trajectory,
        "best_test_auroc": best,
        "test_auroc_at_50": at50,
        "test_auroc_at_100": at100,
        "seconds": round(time.time() - t0, 1),
    }


def main():
    which = sys.argv[1:] or list(VARIANTS)
    os.makedirs(ART_DIR, exist_ok=True)
    out_path = os.path.join(ART_DIR, "ablation.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in which:
        results[name] = run_variant(name, VARIANTS[name])
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(
        {k: {kk: v[kk] for kk in
             ("best_test_auroc", "test_auroc_at_50", "test_auroc_at_100")}
         for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
