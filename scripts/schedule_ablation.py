"""Schedule / relation-group convergence ablation (round 4).

The paper-scale quality run was wall-clock-blocked by the reference
minibatch schedule: 72k steps/epoch, 75% of them re-training the 3 fixed
edge types (``artifacts/perf/epoch_profile.json``).  Before switching the
converged run to ``schedule="balanced"`` + ``relation_group=G``, this
ablation measures what those changes do to CONVERGENCE on the mid-scale
poly50 graph (2000 proteins / 400 drugs / 50 relations, planted_rank=16
— the same generator family as the paper-scale run):

  ref_g1        reference schedule, 1 batch/step   (round-3 behavior)
  bal_g1        balanced schedule,  1 batch/step
  bal_g8        balanced schedule,  8 batches/step, lr 1e-3
  bal_g8_lr3    balanced schedule,  8 batches/step, lr 3e-3

Each runs ``--epochs`` epochs; per-epoch pooled drug-drug val AUROC and
wall time go to ``artifacts/quality/schedule_ablation.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.perf_counter()

CONFIGS = {
    "ref_g1": dict(schedule="reference", relation_group=1, learning_rate=1e-3),
    "bal_g1": dict(schedule="balanced", relation_group=1, learning_rate=1e-3),
    "bal_g8": dict(schedule="balanced", relation_group=8, learning_rate=1e-3),
    "bal_g8_lr3": dict(schedule="balanced", relation_group=8, learning_rate=3e-3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    args = ap.parse_args()

    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7,
        planted_rank=16,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    dg = build_device_graph(
        graph, splits, densify_max_cells=400_000_000, build_fused=False,
    )
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="auto"),
        dg,
    )
    out = {}
    for tag in args.configs.split(","):
        kw = CONFIGS[tag]
        cfg = TrainConfig(
            batch_size=512, loss="hinge", margin=0.1, num_epochs=1,
            scan_chunk=32, **kw,
        )
        trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
        evaluator = AccuracyEvaluator(model, graph, splits)
        steps = trainer.scheduler.num_batches_per_epoch()
        rows = []
        t_start = time.perf_counter()
        for epoch in range(1, args.epochs + 1):
            trainer.train(num_epochs=1)
            emb = evaluator.embeddings(trainer.params, dg)
            val = evaluator.evaluate_all_drug_drug(
                trainer.params, dg, embeddings=emb
            )
            rows.append(
                {
                    "epoch": epoch,
                    "val_auroc": round(val.auroc, 5),
                    "val_auprc": round(val.auprc, 5),
                    "wall_s": round(time.perf_counter() - t_start, 1),
                }
            )
            print(
                f"[{tag} +{time.perf_counter() - T0:.0f}s] epoch {epoch}: "
                f"val AUROC {val.auroc:.4f}", flush=True,
            )
        out[tag] = {"batches_per_epoch": steps, "trajectory": rows}

    path = os.path.join(ROOT, "artifacts", "quality", "schedule_ablation.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({t: v["trajectory"][-1] for t, v in out.items()}))


if __name__ == "__main__":
    main()
