"""Profile one full-scale quality-run epoch end to end (VERDICT r3 item 2).

The round-3 quality run realized ~1670 s/epoch while bench.py measured
23.9 ms/step x ~11.3k steps ~= 280 s/epoch.  This script reproduces the
EXACT quality-run configuration (``scripts/quality_full.py``: planted_rank
16, split seed 8, scan_chunk 32) and times every phase separately:

* host graph + device graph build,
* scheduler epoch enumeration (host-only),
* chunk assembly + dispatch, measured two ways: N chunks synced
  individually (upper bound: dispatch + device serialized) and N chunks
  pipelined with one final sync (the production loop's async behavior),
* the pooled drug-drug eval (embeddings + val + test),
* an orbax checkpoint save.

Writes artifacts/perf/epoch_profile.json.
"""

from __future__ import annotations

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

import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.timing import hard_sync
from decagon_tpu.train.checkpoint import Checkpointer
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.perf_counter()


def log(msg):
    print(f"[profile +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def main():
    out = {}
    t = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7, planted_rank=16,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    out["graph_build_s"] = round(time.perf_counter() - t, 1)
    t = time.perf_counter()
    dg = build_device_graph(
        graph, splits, densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16, build_fused=False,
    )
    out["device_graph_build_s"] = round(time.perf_counter() - t, 1)
    log(f"built: {out}")

    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="auto"), dg
    )
    cfg = TrainConfig(
        batch_size=512, learning_rate=1e-3, loss="hinge", margin=0.1,
        num_epochs=1, scan_chunk=32,
    )
    t = time.perf_counter()
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    out["trainer_init_s"] = round(time.perf_counter() - t, 1)

    # --- scheduler enumeration (host only) -----------------------------
    t = time.perf_counter()
    batches = list(trainer.scheduler.epoch())
    out["scheduler_epoch_s"] = round(time.perf_counter() - t, 2)
    out["steps_per_epoch"] = len(batches)
    log(f"scheduler: {out['scheduler_epoch_s']}s for {len(batches)} batches")

    chunk = cfg.scan_chunk
    # --- compile -------------------------------------------------------
    t = time.perf_counter()
    hard_sync(trainer.train_chunk(batches[:chunk], chunk))
    out["chunk_compile_s"] = round(time.perf_counter() - t, 1)
    log(f"chunk compiled in {out['chunk_compile_s']}s")

    # --- synced chunks (dispatch + device, serialized) -----------------
    n_sync = 8
    times = []
    for i in range(1, 1 + n_sync):
        lo = i * chunk
        t = time.perf_counter()
        trainer.train_chunk(batches[lo:lo + chunk], chunk)
        hard_sync(trainer.params)
        times.append(time.perf_counter() - t)
    out["synced_ms_per_step_min"] = round(min(times) / chunk * 1e3, 2)
    out["synced_ms_per_step_median"] = round(
        float(np.median(times)) / chunk * 1e3, 2
    )
    log(f"synced: {out['synced_ms_per_step_min']} ms/step min, "
        f"{out['synced_ms_per_step_median']} median")

    # --- pipelined chunks (the production loop) ------------------------
    n_pipe = 30
    host_times = []
    t_all = time.perf_counter()
    for i in range(1 + n_sync, 1 + n_sync + n_pipe):
        lo = i * chunk
        t = time.perf_counter()
        trainer.train_chunk(batches[lo:lo + chunk], chunk)
        host_times.append(time.perf_counter() - t)
    hard_sync(trainer.params)
    wall = time.perf_counter() - t_all
    out["pipelined_ms_per_step"] = round(wall / (n_pipe * chunk) * 1e3, 2)
    out["host_dispatch_ms_per_chunk_median"] = round(
        float(np.median(host_times)) * 1e3, 2
    )
    out["host_dispatch_ms_per_chunk_max"] = round(max(host_times) * 1e3, 2)
    log(f"pipelined: {out['pipelined_ms_per_step']} ms/step; host dispatch "
        f"{out['host_dispatch_ms_per_chunk_median']} ms/chunk median")

    # --- projected epoch ----------------------------------------------
    out["projected_epoch_s"] = round(
        out["scheduler_epoch_s"]
        + out["pipelined_ms_per_step"] / 1e3 * len(batches), 1
    )

    # --- eval ----------------------------------------------------------
    evaluator = AccuracyEvaluator(model, graph, splits)
    t = time.perf_counter()
    emb = evaluator.embeddings(trainer.params, dg)
    val = evaluator.evaluate_all_drug_drug(trainer.params, dg, embeddings=emb)
    test = evaluator.evaluate_all_drug_drug(
        trainer.params, dg, use_test=True, embeddings=emb
    )
    out["eval_cold_s"] = round(time.perf_counter() - t, 1)
    t = time.perf_counter()
    emb = evaluator.embeddings(trainer.params, dg)
    evaluator.evaluate_all_drug_drug(trainer.params, dg, embeddings=emb)
    evaluator.evaluate_all_drug_drug(
        trainer.params, dg, use_test=True, embeddings=emb
    )
    out["eval_warm_s"] = round(time.perf_counter() - t, 1)
    log(f"eval cold {out['eval_cold_s']}s warm {out['eval_warm_s']}s "
        f"(val auroc {val.auroc:.3f})")

    # --- checkpoint save ------------------------------------------------
    ckpt_dir = os.path.join(ROOT, "artifacts", "perf", "profile_ckpt")
    checkpointer = Checkpointer(ckpt_dir, max_to_keep=1)
    t = time.perf_counter()
    checkpointer.save(trainer.global_step, trainer.state_dict())
    out["checkpoint_save_s"] = round(time.perf_counter() - t, 1)
    log(f"checkpoint {out['checkpoint_save_s']}s")

    os.makedirs(os.path.join(ROOT, "artifacts", "perf"), exist_ok=True)
    with open(os.path.join(ROOT, "artifacts", "perf", "epoch_profile.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
