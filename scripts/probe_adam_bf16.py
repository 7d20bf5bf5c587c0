"""bf16 Adam moments: paper-scale step time + mid-scale quality check.

Writes artifacts/quality/adam_bf16_moments.json: (a) full-scale factored
step ms with f32 vs bf16 moments, (b) poly50 10-epoch val-AUROC
trajectories under both, same seeds.
"""
from __future__ import annotations

import json, os, sys, time

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
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.perf_counter()
log = lambda m: print(f"[adambf16 +{time.perf_counter()-T0:.0f}s] {m}", flush=True)

out = {}

# ---- quality: poly50, 10 epochs, both dtypes -------------------------
graph = make_polypharmacy_like_graph(
    n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7, planted_rank=16,
)
splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
dg = build_device_graph(
    graph, splits, densify_max_cells=400_000_000, build_fused=False,
    dense_factored=True,
)
model = DecagonModel(
    ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="auto"), dg
)
for dtype in ("float32", "bfloat16"):
    cfg = TrainConfig(
        batch_size=512, learning_rate=3e-3, scan_chunk=32,
        schedule="balanced", relation_group=8, num_epochs=1,
        adam_moments_dtype=dtype,
    )
    tr = Trainer(model, graph, splits, dg, cfg, seed=0)
    ev = AccuracyEvaluator(model, graph, splits)
    traj = []
    for ep in range(10):
        tr.train(num_epochs=1)
        emb = ev.embeddings(tr.params, dg)
        traj.append(round(ev.evaluate_all_drug_drug(tr.params, dg, embeddings=emb).auroc, 5))
    out[f"poly50_val_auroc_{dtype}"] = traj
    log(f"{dtype}: {traj}")

# ---- perf: paper-scale factored step ---------------------------------
graph = make_polypharmacy_like_graph(
    n_proteins=19081, n_drugs=645, n_side_effects=963,
    min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
    ppi_attachment=37, seed=7,
)
splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
dg = build_device_graph(
    graph, splits, densify_max_cells=1_000_000_000,
    dense_dtype=jnp.bfloat16, build_fused=False, dense_factored=True,
)
model = DecagonModel(
    ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl="dense_factored"), dg
)
for dtype in ("float32", "bfloat16"):
    cfg = TrainConfig(
        batch_size=512, learning_rate=1e-3, scan_chunk=20,
        adam_moments_dtype=dtype,
    )
    tr = Trainer(model, graph, splits, dg, cfg, seed=0)
    batches = []
    while len(batches) < 20 * 7:
        batches.extend(tr.scheduler.epoch())
    hard_sync(tr.train_chunk(batches[:20], 20))
    times = []
    for rep in range(5):
        lo = 20 * (1 + rep)
        t0 = time.perf_counter()
        tr.train_chunk(batches[lo:lo+20], 20)
        hard_sync(tr.params)
        times.append((time.perf_counter() - t0) / 20)
    out[f"fullscale_factored_ms_{dtype}"] = round(min(times) * 1e3, 2)
    log(f"fullscale {dtype}: {out[f'fullscale_factored_ms_{dtype}']} ms/step")

path = os.path.join(ROOT, "artifacts", "quality", "adam_bf16_moments.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
