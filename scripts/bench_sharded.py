"""Sharded-step throughput vs single-chip (VERDICT r2 item 1).

Measures steady-state training throughput of the (row, edge)-sharded
train step against the plain single-device step on the SAME workload:

* on the real TPU (1 chip): mesh (1, 1) — the sharding machinery's
  overhead with no actual partitioning; target within ~1.5x of the
  single-chip per-step cost;
* on the virtual 8-device CPU mesh (JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8): meshes (1, 8) and
  (2, 4) — correctness-shaped scaling signal (virtual devices share one
  host's cores, so absolute speedups are not meaningful; the number to
  watch is that sharded per-device cost stays in the same decade).

Methodology note (round 3): throughput is measured PIPELINED — N steps
dispatched back to back, one hard sync at the end — because that is how
training actually runs; per-step host sync would measure the host<->TPU
tunnel round trip (~25 ms on remote-attached chips), which is exactly
the artifact that made round 2's sharded step look 29x slower.  The
per-step-synced latency is also recorded as a separate diagnostic.
Both paths also report the scanned-chunk (lax.scan) variant.

Writes artifacts/perf/sharded_bench_<backend>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The ambient sitecustomize pins the TPU platform at import; honoring
# JAX_PLATFORMS=cpu requires the config update too (verify-skill gotcha
# — without this a "CPU" run lands on the chip and fights whatever is
# training there).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

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

from decagon_tpu.timing import hard_sync

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


def pipelined_ms(trainer, steps=60, warmup=10):
    """Steady-state ms/step: back-to-back dispatch, one trailing sync."""
    batches = []
    while len(batches) < warmup + steps:
        batches.extend(trainer.scheduler.epoch())
    for b in batches[:warmup]:
        trainer.train_batch(b)
    hard_sync(trainer.params)
    t0 = time.perf_counter()
    for b in batches[warmup : warmup + steps]:
        trainer.train_batch(b)
    hard_sync(trainer.params)
    return (time.perf_counter() - t0) / steps * 1e3


def synced_ms(trainer, steps=20, warmup=4):
    """Per-step-synced latency (diagnostic: includes dispatch+readback)."""
    batches = []
    while len(batches) < warmup + steps:
        batches.extend(trainer.scheduler.epoch())
    for b in batches[:warmup]:
        trainer.train_batch(b)
    hard_sync(trainer.params)
    times = []
    for b in batches[warmup : warmup + steps]:
        t0 = time.perf_counter()
        trainer.train_batch(b)
        hard_sync(trainer.params)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def chunked_ms(trainer, chunk=16, n_chunks=6):
    """ms/step through the scanned-chunk path (one dispatch per chunk)."""
    batches = []
    while len(batches) < chunk * (n_chunks + 2):
        batches.extend(trainer.scheduler.epoch())
    for i in range(2):
        trainer.train_chunk(batches[i * chunk : (i + 1) * chunk], chunk)
    hard_sync(trainer.params)
    t0 = time.perf_counter()
    for i in range(2, 2 + n_chunks):
        trainer.train_chunk(batches[i * chunk : (i + 1) * chunk], chunk)
    hard_sync(trainer.params)
    return (time.perf_counter() - t0) / (n_chunks * chunk) * 1e3



def _merge_artifact(key, entry):
    """Merge an entry into the backend artifact (incremental save)."""
    out = os.path.join(ART, f"sharded_bench_{jax.default_backend()}.json")
    result = {}
    if os.path.exists(out):
        with open(out) as f:
            result = json.load(f)
    result.setdefault(key, {}).update(entry)
    os.makedirs(ART, exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


def bench_fullscale_sharded():
    """Full-scale (963-relation) sharded entry: the paper-scale workload
    through the (1,1)-mesh scanned-chunk sharded step vs the single-chip
    chunked step (bf16 dense stacks both).  Appends to the artifact."""
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16, build_fused=False,
    )
    model = DecagonModel(ModelConfig(spmm_impl="auto"), dg)
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=16)
    nnz = sum(
        int(np.count_nonzero(np.asarray(a.vals)))
        for a in dg.adj.values()
    )
    single = Trainer(model, graph, splits, dg, cfg, seed=0)
    single_ms = chunked_ms(single, chunk=16, n_chunks=3)
    # Incremental save: a slow-compile day must not lose this half.
    _merge_artifact("fullscale_963rel", {
        "nnz": nnz,
        "single_chunk16_ms_per_step": round(single_ms, 3),
    })
    print(f"single chunk16: {single_ms:.3f} ms/step", flush=True)

    from decagon_tpu.parallel.mesh import make_mesh
    from decagon_tpu.parallel.rowshard import build_sharded_device_graph

    shape = (1, 1) if len(jax.devices()) == 1 else (2, 4)
    mesh = make_mesh(shape=shape)
    sgraph = build_sharded_device_graph(
        graph, splits, mesh,
        densify_max_cells_per_device=1_000_000_000,
        dense_dtype=jnp.bfloat16,
    )
    st = Trainer(
        model, graph, splits, sgraph, cfg, seed=0, mesh=mesh,
        init_state=jax.tree.map(jnp.copy, single.state_dict()),
    )
    sharded_ms = chunked_ms(st, chunk=16, n_chunks=3)
    entry = {
        "nnz": nnz,
        "single_chunk16_ms_per_step": round(single_ms, 3),
        f"sharded_{shape[0]}x{shape[1]}_chunk16_ms_per_step": round(
            sharded_ms, 3
        ),
        "sharded_vs_single": round(sharded_ms / single_ms, 3),
        "sharded_edges_per_s": round(nnz / (sharded_ms / 1e3), 1),
    }
    _merge_artifact("fullscale_963rel", entry)
    print(json.dumps(entry, indent=1))


def main():
    if "--full" in sys.argv:
        bench_fullscale_sharded()
        return
    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, densify_max_cells=400_000_000, build_fused=False
    )
    model = DecagonModel(ModelConfig(spmm_impl="auto"), dg)
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3)
    cfg_chunk = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=16)

    result = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    single = Trainer(model, graph, splits, dg, cfg, seed=0)
    result["single_ms_per_step"] = round(pipelined_ms(single), 3)
    result["single_ms_per_step_synced"] = round(synced_ms(single), 3)
    single_c = Trainer(model, graph, splits, dg, cfg_chunk, seed=0)
    result["single_chunk16_ms_per_step"] = round(chunked_ms(single_c), 3)

    shapes = [(1, 1)] if len(jax.devices()) == 1 else [(1, 8), (2, 4)]
    from decagon_tpu.parallel.mesh import make_mesh

    from decagon_tpu.parallel.rowshard import build_sharded_device_graph

    for shape in shapes:
        mesh = make_mesh(shape=shape)
        # Same densify budget as the single-chip graph — otherwise the
        # sharded step silently falls to segment-sum on edge types the
        # single-chip run densifies (apples to apples).
        sgraph = build_sharded_device_graph(
            graph, splits, mesh,
            densify_max_cells_per_device=400_000_000,
        )
        # Fresh copies: the donating train step would otherwise delete
        # arrays shared with the previous trainer's state.
        tag = f"sharded_{shape[0]}x{shape[1]}"
        t = Trainer(
            model, graph, splits, sgraph, cfg, seed=0, mesh=mesh,
            init_state=jax.tree.map(jnp.copy, single.state_dict()),
        )
        ms = pipelined_ms(t)
        result[f"{tag}_ms_per_step"] = round(ms, 3)
        result[f"{tag}_vs_single"] = round(
            ms / result["single_ms_per_step"], 3
        )
        result[f"{tag}_ms_per_step_synced"] = round(synced_ms(t), 3)
        t_c = Trainer(
            model, graph, splits, sgraph, cfg_chunk, seed=0, mesh=mesh,
            init_state=jax.tree.map(jnp.copy, single.state_dict()),
        )
        cms = chunked_ms(t_c)
        result[f"{tag}_chunk16_ms_per_step"] = round(cms, 3)
        result[f"{tag}_chunk16_vs_single"] = round(
            cms / result["single_ms_per_step"], 3
        )

    os.makedirs(ART, exist_ok=True)
    out = os.path.join(ART, f"sharded_bench_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
