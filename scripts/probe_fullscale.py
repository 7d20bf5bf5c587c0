"""Probe: build + train the BASELINE configs 3-4 scale graph on one chip.

Stages timed separately so bottlenecks are attributable:
  1. synthetic graph generation (19081 proteins, 645 drugs, 963 relations,
     ~4.65M drug-drug edge instances + transposes)
  2. split + negative sampling
  3. build_device_graph (flattened stacks, CDFs, Pallas tilings)
  4. device transfer + param init + first compiled step
  5. steady-state chunked step latency -> edges/s + HBM stats

Usage: python scripts/probe_fullscale.py [--relations N] [--impl auto]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stage(name, t0):
    t1 = time.perf_counter()
    print(f"[{t1 - t0:8.2f}s] {name}", flush=True)
    return t1


def hbm_stats():
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            return {
                k: round(v / 2**30, 3)
                for k, v in stats.items()
                if "bytes" in k and v
            }
    except Exception:
        pass
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relations", type=int, default=963)
    ap.add_argument("--proteins", type=int, default=19081)
    ap.add_argument("--drugs", type=int, default=645)
    ap.add_argument("--edges", type=int, default=4_651_131)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--densify-max-cells", type=int, default=8_000_000)
    ap.add_argument("--dense-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--no-tiles", action="store_true")
    ap.add_argument("--steps", type=int, default=3, help="timed chunks")
    args = ap.parse_args()

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    t = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=args.proteins,
        n_drugs=args.drugs,
        n_side_effects=args.relations,
        min_edges_per_relation=500,
        total_drugdrug_edges=args.edges,
        ppi_attachment=37,
        seed=7,
    )
    nnz_raw = sum(
        r.rows.shape[0] for rels in graph.relations.values() for r in rels
    )
    n_rel = sum(len(rels) for rels in graph.relations.values())
    print(f"graph: {n_rel} relations (incl transposes), {nnz_raw} edges")
    t = stage("synthetic graph", t)

    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    t = stage("split + negatives", t)

    on_accel = jax.default_backend() != "cpu"
    device_graph = build_device_graph(
        graph, splits,
        tile_for_pallas=on_accel and not args.no_tiles,
        densify_max_cells=args.densify_max_cells,
        dense_dtype=jnp.bfloat16 if args.dense_dtype == "bf16" else np.float32,
    )
    t = stage("build_device_graph", t)
    print("HBM after graph:", hbm_stats())
    for key, adj in device_graph.adj.items():
        nnz = int(np.count_nonzero(np.asarray(adj.vals)))
        extra = ""
        if adj.tiles_fwd is not None:
            from decagon_tpu.ops.tiling import tiling_stats
            sf = tiling_stats(adj.tiles_fwd)
            sb = tiling_stats(adj.tiles_bwd)
            extra = (
                f" tiles_fwd={sf['num_tiles']} occ={sf['occupancy']:.2f}"
                f" tiles_bwd={sb['num_tiles']} occ={sb['occupancy']:.2f}"
            )
        print(
            f"  adj[{key}]: K={adj.num_rel} {adj.n_rows}x{adj.n_cols}"
            f" nnz={nnz} pad={adj.num_edges_padded}"
            f" dense={'yes' if adj.dense is not None else 'no'}{extra}"
        )

    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl=args.impl),
        device_graph,
    )
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=args.chunk)
    trainer = Trainer(model, graph, splits, device_graph, cfg, seed=0)
    t = stage("trainer init (params + opt)", t)
    print("HBM after params:", hbm_stats())

    batches = []
    it = trainer.scheduler.epoch()
    need = args.chunk * (args.steps + 2)
    for b in it:
        batches.append(b)
        if len(batches) >= need:
            break
    t = stage(f"sampled {len(batches)} batches", t)

    from decagon_tpu.timing import hard_sync
    hard_sync(trainer.train_chunk(batches[: args.chunk], args.chunk))
    t = stage("compile + first chunk", t)
    print("HBM after first step:", hbm_stats())

    nnz = sum(
        int(np.count_nonzero(np.asarray(a.vals)))
        for a in device_graph.adj.values()
    )
    times = []
    for i in range(args.steps):
        lo = args.chunk * (1 + i)
        start = time.perf_counter()
        trainer.train_chunk(batches[lo : lo + args.chunk], args.chunk)
        hard_sync(trainer.params)
        times.append(time.perf_counter() - start)
    per_step = min(times) / args.chunk
    print(
        f"steady state: {per_step * 1e3:.2f} ms/step; "
        f"{nnz / per_step / 1e6:.1f}M edges/s "
        f"(times: {[round(x, 3) for x in times]})"
    )


if __name__ == "__main__":
    main()
