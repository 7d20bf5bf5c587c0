"""Dense-INFEASIBLE regime bench: Pallas tiled SpMM vs XLA segment-sum
(VERDICT r3 item 4 — "benchmark the Pallas SpMM where dense cannot go").

Workload: 2500 drugs x 963 side-effect relations -> the drug-drug dense
stack would be 1926 x 2500 x 2500 cells (~12 TB bf16) — two orders of
magnitude past HBM, so the dense-stack path cannot exist and the
kernel's real competitor is XLA gather + segment-sum over the COO
stream.  ~8M drug-drug edges (+transposes) + PPI/targets at paper
protein scale (19081).

Times the full train step (fwd+bwd+Adam, scanned chunk) with
``spmm_impl="xla"`` vs ``spmm_impl="pallas"`` at both kernel precisions
— "default" exercises the round-4 bf16 source windows (half the
dominant per-tile DMA).  Writes artifacts/perf/sparse_regime_bench.json
(referenced by bench.py's output as ``sparse_regime_ref``).
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
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.perf_counter()


def log(msg):
    print(f"[sparse +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


def steady_ms(trainer, chunk=10, windows=4):
    batches = []
    need = chunk * (windows + 2)
    while len(batches) < need:
        batches.extend(trainer.scheduler.epoch())
    hard_sync(trainer.train_chunk(batches[:chunk], chunk))
    times = []
    for rep in range(windows):
        lo = chunk * (1 + rep)
        t0 = time.perf_counter()
        trainer.train_chunk(batches[lo:lo + chunk], chunk)
        hard_sync(trainer.params)
        times.append((time.perf_counter() - t0) / chunk)
    return min(times) * 1e3


def main():
    build_t0 = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=2500, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=8_000_000,
        ppi_attachment=37, seed=7,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits,
        tile_for_pallas=True,
        densify_max_cells=0,  # NOTHING densifies: the infeasible regime
        build_fused=False,
    )
    build_s = time.perf_counter() - build_t0
    nnz = sum(
        int(np.count_nonzero(np.asarray(a.vals))) for a in dg.adj.values()
    )
    dd = dg.adj["1,1"]
    infeasible_tb = dd.num_rel * dd.n_rows * dd.n_cols * 2 / 2**40
    log(f"built in {build_s:.0f}s; nnz={nnz}; dd dense stack would be "
        f"{infeasible_tb:.1f} TB bf16")

    out = {
        "workload": (
            f"19081 prot / 2500 drugs / 963 rels x2, nnz={nnz}; "
            f"dd dense stack would be {infeasible_tb:.1f} TB bf16 "
            "(dense path impossible)"
        ),
        "host_build_s": round(build_s, 1),
    }
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=10)
    shared_state = None
    for tag, impl, precision in (
        ("xla", "xla", "highest"),
        ("pallas_bf16", "pallas", "default"),
        ("pallas_f32", "pallas", "highest"),
    ):
        model = DecagonModel(
            ModelConfig(
                hidden1=64, hidden2=32, dropout=0.1,
                spmm_impl=impl, spmm_precision=precision,
            ),
            dg,
        )
        trainer = Trainer(
            model, graph, splits, dg, cfg, seed=0,
            init_state=None if shared_state is None
            else jax.tree.map(jnp.copy, shared_state),
        )
        if shared_state is None:
            shared_state = jax.tree.map(jnp.copy, trainer.state_dict())
        ms = steady_ms(trainer)
        out[tag] = {
            "ms_per_step_min": round(ms, 2),
            "edges_per_s": round(nnz / (ms / 1e3), 1),
        }
        log(f"{tag}: {out[tag]}")
    out["pallas_vs_xla"] = round(
        out["xla"]["ms_per_step_min"]
        / out["pallas_bf16"]["ms_per_step_min"], 2
    )
    path = os.path.join(ROOT, "artifacts", "perf", "sparse_regime_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
