"""Scale benchmark: training throughput on a polypharmacy-shaped graph.

Runs the same jitted chunked train step as bench.py on the larger
``make_polypharmacy_like_graph`` fixture (default 2000 proteins, 400
drugs, 50 side-effect relations + transposes — BASELINE.json configs
2-4 shape) and prints edges/s/chip for each SpMM impl.

Usage: python scripts/bench_scale.py [n_side_effects] [impls]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer


def main() -> None:
    n_se = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    impls = sys.argv[2].split(",") if len(sys.argv) > 2 else ["xla", "pallas"]
    chunk = 50
    t0 = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=n_se, seed=7
    )
    print(f"# graph built ({time.perf_counter() - t0:.1f}s)", flush=True)
    splits = split_graph(graph, val_frac=0.05, test_frac=0.0, seed=1)
    print(f"# splits done ({time.perf_counter() - t0:.1f}s)", flush=True)

    for impl in impls:
        t_build = time.perf_counter()
        device_graph = build_device_graph(
            graph, splits,
            tile_for_pallas=("pallas" in impl or impl == "auto"),
        )
        build_s = time.perf_counter() - t_build
        nnz = sum(
            int(jnp.count_nonzero(a.vals)) for a in device_graph.adj.values()
        )
        model = DecagonModel(
            ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl=impl),
            device_graph,
        )
        cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=chunk)
        trainer = Trainer(model, graph, splits, device_graph, cfg, seed=0)
        batches = list(trainer.scheduler.epoch())
        while len(batches) < 3 * chunk:
            batches += list(trainer.scheduler.epoch())

        print(f"# [{impl}] device graph built ({build_s:.1f}s); compiling",
              flush=True)
        __import__('decagon_tpu.timing', fromlist=['hard_sync']).hard_sync(
            trainer.train_chunk(batches[:chunk], chunk)
        )  # warmup/compile
        print(f"# [{impl}] compiled ({time.perf_counter() - t_build:.1f}s)",
              flush=True)
        n_timed = 2 * chunk
        start = time.perf_counter()
        for i in range(chunk, chunk + n_timed, chunk):
            trainer.train_chunk(batches[i : i + chunk], chunk)
        __import__('decagon_tpu.timing', fromlist=['hard_sync']).hard_sync(trainer.params)
        step_ms = (time.perf_counter() - start) / n_timed * 1e3
        print(
            json.dumps(
                {
                    "impl": impl,
                    "n_side_effects": n_se,
                    "nnz": nnz,
                    "step_ms": round(step_ms, 3),
                    "edges_per_s": round(nnz / step_ms * 1e3, 1),
                    "graph_build_s": round(build_s, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
