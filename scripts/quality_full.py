"""Full-scale converged quality run (VERDICT r2 item 3).

Trains the paper-scale polypharmacy-like graph — 19081 proteins, 645
drugs, 963 side-effect relations (>=500 edges each, 4.65M drug-drug
edges) with ``planted_rank`` structure so the relations are learnable —
to an AUROC plateau on the real chip, with per-epoch pooled drug-drug
val/test metrics streamed to ``artifacts/quality/poly963_metrics.csv``
and orbax checkpoints for resume.  BASELINE north star: test AUROC
>= 0.87 (paper, DEDICOM); if the synthetic proxy plateaus below that,
the trajectory documents its ceiling.

Reference hparams throughout (configuration.json: hidden 64->32, batch
512, lr 1e-3, dropout 0.1, hinge margin 0.1).

Round 4: the reference iter%4 schedule made epochs 72k steps (~1670 s;
75% of them re-training the 3 fixed relations ~30x — artifacts/perf/
epoch_profile.json), which is why the round-3 run stopped at epoch 3.
This run uses schedule="balanced" + relation_group=8 at lr 3e-3 —
validated to match the reference schedule's per-epoch convergence on the
mid-scale config (artifacts/quality/schedule_ablation.json: 10-epoch val
AUROC 0.754 vs 0.752 at ~1/14 the wall) — cutting the epoch to ~27x
fewer optimization steps at identical training-edge visits.

Usage: python scripts/quality_full.py [--max-hours H] [--max-epochs N]
Resumable: re-running continues from the latest checkpoint and appends
to the CSV.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Persistent compile cache (see bench.py): remote-compile latency varies
# wildly between sessions; harmless no-op if unsupported.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.checkpoint import Checkpointer
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART_DIR = os.path.join(ROOT, "artifacts", "quality")
CKPT_DIR = os.path.join(ROOT, "artifacts", "quality", "poly963_ckpt_r5")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--max-epochs", type=int, default=60)
    ap.add_argument("--patience", type=int, default=6)
    ap.add_argument("--ckpt-every", type=int, default=3,
                    help="epochs between checkpoint saves (a save costs "
                         "~70s over the device tunnel)")
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--lr-schedule", default="cosine",
                    choices=["constant", "cosine", "step"],
                    help="lr decay over optimization steps: the r4 run "
                         "plateaued 0.024 below its best epoch from "
                         "lr-3e-3 oscillation (QUALITY_NOTE); cosine "
                         "decay makes the target hold at convergence")
    ap.add_argument("--lr-schedule-epochs", type=int, default=10,
                    help="epochs over which cosine decays to "
                         "lr*lr_min_frac (0.1)")
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--noise", type=float, default=0.3,
                    help="planted selection noise; 0.3 caps the proxy's "
                         "oracle ceiling at 0.856 test AUROC, 0.15 at "
                         "0.934 (artifacts/quality/oracle_ceiling.json) "
                         "- non-default runs write tagged artifacts")
    args = ap.parse_args()

    t0 = time.time()

    def log(msg):
        print(f"[poly963 +{time.time() - t0:.0f}s] {msg}", flush=True)

    tag = "" if args.noise == 0.3 else f"_noise{args.noise:g}"
    ckpt_dir = CKPT_DIR + tag
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7, planted_rank=16,
        planted_noise=args.noise,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    dg = build_device_graph(
        graph, splits, densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16, build_fused=False,
        dense_factored=True, dense_paired=True,
    )
    log("graph + device graph built")
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="auto"),
        dg,
    )
    # lr schedule horizon in OPTIMIZATION steps (balanced epochs have a
    # deterministic batch count; grouped steps consume one per G batches)
    batch = 512
    n_batches = sum(
        -(-splits[k].train.shape[0] // batch)
        for k in graph.relation_keys()
        if splits[k].train.shape[0] > 0
    )
    opt_steps_per_epoch = -(-n_batches // args.group)
    cfg = TrainConfig(
        batch_size=batch, learning_rate=args.lr, loss="hinge", margin=0.1,
        num_epochs=1, scan_chunk=32, schedule="balanced",
        relation_group=args.group,
        lr_schedule=args.lr_schedule,
        lr_schedule_steps=args.lr_schedule_epochs * opt_steps_per_epoch,
        lr_min_frac=0.1,
    )
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    evaluator = AccuracyEvaluator(model, graph, splits)
    checkpointer = Checkpointer(ckpt_dir, max_to_keep=2)
    resumed = trainer.try_resume(checkpointer)
    # Track epochs via global_step (balanced epochs have an exact,
    # deterministic batch count — no RNG-consuming dry enumeration).
    steps_per_epoch = trainer.scheduler.num_batches_per_epoch()
    start_epoch = trainer.global_step // steps_per_epoch
    log(
        f"steps/epoch={steps_per_epoch} resumed={resumed} "
        f"start_epoch={start_epoch}"
    )

    os.makedirs(ART_DIR, exist_ok=True)
    csv_path = os.path.join(ART_DIR, f"poly963{tag}_metrics.csv")
    # Provenance sidecar: the quality gates (tests/test_quality.py)
    # assert the checked-in trajectory was produced by THIS config —
    # a regenerated CSV with different noise/seed/hparams fails the
    # gate instead of silently rotting (VERDICT r4 weak #8).
    provenance = {
        "graph": {
            "n_proteins": 19081, "n_drugs": 645, "n_side_effects": 963,
            "min_edges_per_relation": 500,
            "total_drugdrug_edges": 4_651_131, "ppi_attachment": 37,
            "seed": 7, "planted_rank": 16, "planted_noise": args.noise,
        },
        "split_seed": 8,
        "model": {"hidden1": 64, "hidden2": 32, "dropout": 0.1,
                  "spmm_impl": "auto"},
        "train": {
            "batch_size": 512, "learning_rate": args.lr,
            "loss": "hinge", "margin": 0.1, "schedule": "balanced",
            "relation_group": args.group,
            "lr_schedule": args.lr_schedule,
            "lr_schedule_steps": cfg.lr_schedule_steps,
            "lr_min_frac": 0.1,
            "adam_moments_dtype": cfg.adam_moments_dtype,
            "grad_dtype": getattr(cfg, "grad_dtype", "float32"),
        },
        "trainer_seed": 0,
    }
    with open(
        os.path.join(ART_DIR, f"poly963{tag}_metrics.meta.json"), "w"
    ) as mf:
        json.dump(provenance, mf, indent=1)
    mode = "a" if resumed and os.path.exists(csv_path) else "w"
    best_val, since_best = -1.0, 0
    f = open(csv_path, mode, newline="")
    writer = csv.writer(f)
    if mode == "w":
        writer.writerow(
            ["Epoch", "ValAUROC", "ValAUPRC", "ValAPK",
             "TestAUROC", "TestAUPRC", "TestAPK", "Seconds"]
        )
    final = None
    for epoch in range(start_epoch + 1, args.max_epochs + 1):
        trainer.train(num_epochs=1)
        emb = evaluator.embeddings(trainer.params, dg)
        val = evaluator.evaluate_all_drug_drug(
            trainer.params, dg, embeddings=emb
        )
        test = evaluator.evaluate_all_drug_drug(
            trainer.params, dg, use_test=True, embeddings=emb
        )
        writer.writerow(
            [epoch, f"{val.auroc:.5f}", f"{val.auprc:.5f}",
             f"{val.apk:.5f}", f"{test.auroc:.5f}", f"{test.auprc:.5f}",
             f"{test.apk:.5f}", f"{time.time() - t0:.1f}"]
        )
        f.flush()
        if epoch % args.ckpt_every == 0 or epoch == args.max_epochs:
            checkpointer.save(trainer.global_step, trainer.state_dict())
        log(
            f"epoch {epoch}: val AUROC {val.auroc:.4f} "
            f"test AUROC {test.auroc:.4f} AUPRC {test.auprc:.4f}"
        )
        final = (epoch, val, test)
        if val.auroc > best_val + 0.001:
            best_val, since_best = val.auroc, 0
        else:
            since_best += 1
            if since_best >= args.patience:
                log(f"plateau at epoch {epoch}")
                break
        if (time.time() - t0) / 3600 > args.max_hours:
            log("wall-time budget reached")
            break
    f.close()
    if final is not None:
        epoch, val, test = final
        log(
            f"FINAL epoch {epoch}: test AUROC {test.auroc:.4f} "
            f"AUPRC {test.auprc:.4f} (north star >= 0.87)"
        )


if __name__ == "__main__":
    main()
