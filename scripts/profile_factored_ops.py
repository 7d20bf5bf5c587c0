"""Per-op device profile of the PRODUCTION factored train step.

Captures a jax.profiler trace around steady-state scanned-chunk
dispatches of the paper-scale int8-factored step (bench.py's
full_factored_int8 configuration), parses the xplane protobuf, and
aggregates per-HLO-op self-time on the TPU device plane — the "where do
the other ms go" artifact VERDICT r4 asked for.

Writes artifacts/perf/factored_op_profile.json.

Usage: python scripts/profile_factored_ops.py [--relations 963]
       [--spmm dense_factored|dense|paired]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


def _self_times(events):
    """Per-event self time from a flat list of (start, end, name)
    hierarchical intervals on one timeline: duration minus the direct
    children's durations (while/conditional/fusion wrappers enclose the
    leaf ops they run)."""
    evs = sorted(events, key=lambda e: (e[0], -e[1]))
    stack = []  # (end, child_sum_accumulator index)
    selfs = []
    child_sum = []
    for start, end, name in evs:
        while stack and stack[-1][0] <= start:
            stack.pop()
        if stack:
            child_sum[stack[-1][1]] += end - start
        selfs.append([name, end - start])
        child_sum.append(0)
        stack.append((end, len(selfs) - 1))
    return [(n, d - c) for (n, d), c in zip(selfs, child_sum)]


def parse_xplane(logdir: str, top_n: int = 40) -> dict:
    """Aggregate self-time by op name over every TPU device plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return {"error": "no xplane.pb written"}
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            events = [
                (
                    ev.offset_ps,
                    ev.offset_ps + ev.duration_ps,
                    ev_meta.get(ev.metadata_id, str(ev.metadata_id)),
                )
                for ev in line.events
            ]
            totals = defaultdict(float)
            counts = defaultdict(int)
            for name, self_ps in _self_times(events):
                # collapse the %op.NNN = shape instance spam to the
                # op name + result shape prefix
                short = name.split(" = ")
                key = (
                    short[0].rstrip("0123456789.")
                    + (" = " + short[1][:70] if len(short) > 1 else "")
                )
                totals[key] += self_ps / 1e9  # ms
                counts[key] += 1
            ranked = sorted(totals.items(), key=lambda kv: -kv[1])
            out[f"{plane.name}/{line.name}"] = {
                "total_ms": round(sum(totals.values()), 3),
                "ops": [
                    {"op": k, "ms": round(v, 3), "n": counts[k]}
                    for k, v in ranked[:top_n]
                ],
            }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relations", type=int, default=963)
    ap.add_argument("--spmm", default="dense_factored")
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--out", default="factored_op_profile.json")
    args = ap.parse_args()

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.timing import hard_sync
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    t0 = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=args.relations,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits,
        densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16,
        build_fused=False,
        dense_factored=True,
        dense_paired=True,
    )
    print(f"graph built {time.perf_counter()-t0:.0f}s", flush=True)

    model = DecagonModel(ModelConfig(spmm_impl=args.spmm), dg)
    cfg = TrainConfig(batch_size=512, scan_chunk=args.chunk)
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)

    batches = []
    for b in trainer.scheduler.epoch():
        batches.append(b)
        if len(batches) >= args.chunk * 4:
            break

    # warm up (compile + layout settle)
    losses = trainer.train_chunk(batches[: args.chunk], args.chunk)
    hard_sync(losses)
    losses = trainer.train_chunk(batches[args.chunk : 2 * args.chunk], args.chunk)
    hard_sync(losses)
    print("warmed up", flush=True)

    t0 = time.perf_counter()
    losses = trainer.train_chunk(batches[: args.chunk], args.chunk)
    hard_sync(losses)
    wall_ms = (time.perf_counter() - t0) / args.chunk * 1e3

    logdir = tempfile.mkdtemp(prefix="facprof_")
    with jax.profiler.trace(logdir):
        losses = trainer.train_chunk(
            batches[args.chunk : 2 * args.chunk], args.chunk
        )
        hard_sync(losses)
    print("traced; parsing", flush=True)

    planes = parse_xplane(logdir)
    result = {
        "config": {
            "relations": args.relations,
            "spmm_impl": args.spmm,
            "scan_chunk": args.chunk,
            "steps_traced": args.chunk,
        },
        "wall_ms_per_step": round(wall_ms, 3),
        "planes": planes,
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, args.out), "w") as f:
        json.dump(result, f, indent=1)
    # brief console table
    for pname, p in planes.items():
        if isinstance(p, dict) and "ops" in p:
            print(f"== {pname}: total {p['total_ms']} ms over "
                  f"{args.chunk} steps")
            for o in p["ops"][:25]:
                print(f"  {o['ms']:9.3f} ms  x{o['n']:<5d} {o['op'][:90]}")


if __name__ == "__main__":
    main()
