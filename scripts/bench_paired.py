"""Paper-scale A/B: paired factored Pallas step vs the r4 factored step.

Builds ONE device graph carrying both the dense_factored stacks and the
paired half-stacks, times the production scanned-chunk trainer through
both dispatches, and records per-op attribution knobs (mask GB, kernel
µbenches).  Writes artifacts/perf/paired_bench.json.
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

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.ops import spmm_paired as sp
from decagon_tpu.timing import hard_sync
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


def timed_chunks(trainer, batches, chunk, windows=5):
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        losses = trainer.train_chunk(batches[: chunk], chunk)
        hard_sync(losses)
        times.append((time.perf_counter() - t0) / chunk * 1e3)
    return {"min_ms": min(times), "median_ms": sorted(times)[len(times) // 2]}


def main():
    t0 = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=963,
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
    out = {}
    for key in ("0,0", "1,1"):
        adj = dg.adj[key]
        out[f"pair_{key}"] = {
            "built": adj.pair_mask is not None,
            "mask_shape": (
                list(adj.pair_mask.shape)
                if adj.pair_mask is not None else None
            ),
            "mask_gb": (
                round(adj.pair_mask.size / 2**30, 3)
                if adj.pair_mask is not None else None
            ),
        }
    print(json.dumps(out), flush=True)

    # --- kernel µbench: fwd + bwd per edge type vs XLA factored -------
    rng = np.random.default_rng(0)
    for key in ("1,1", "0,0"):
        adj = dg.adj[key]
        if adj.pair_mask is None:
            continue
        two_k, n, h = adj.num_rel, adj.n_rows, 64
        k = two_k // 2
        p_t = jnp.asarray(
            rng.standard_normal((2, k, h, n)).astype(np.float32)
        )
        p_s = jnp.transpose(p_t.reshape(two_k, h, n), (0, 2, 1))
        ct = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))

        # The adjacency is an ARGUMENT, never a closure constant: the
        # axon remote-compile endpoint rejects >~3 GB captured consts
        # (HTTP 413 — verify-skill gotcha).
        @jax.jit
        def fwd_pair(p_t, adj):
            return sp.spmm_paired(p_t, adj, impl="paired")

        @jax.jit
        def fwd_fact(p_s, adj):
            from decagon_tpu.ops.segment import spmm_dense_factored

            return spmm_dense_factored(
                p_s, adj.dense_mask, adj.dense_mask_t,
                adj.row_scale, adj.col_scale,
            )

        @jax.jit
        def fwdbwd_pair(p_t, ct, adj):
            def f(q):
                return jnp.sum(sp.spmm_paired(q, adj, impl="paired") * ct)

            return jax.grad(f)(p_t)

        @jax.jit
        def fwdbwd_fact(p_s, ct, adj):
            from decagon_tpu.ops.segment import spmm_dense_factored

            def f(q):
                return jnp.sum(
                    spmm_dense_factored(
                        q, adj.dense_mask, adj.dense_mask_t,
                        adj.row_scale, adj.col_scale,
                    ) * ct
                )

            return jax.grad(f)(p_s)

        def timeit(fn, *args, reps=10):
            o = fn(*args); hard_sync(o)
            o = fn(*args); hard_sync(o)
            t0 = time.perf_counter()
            for _ in range(reps):
                o = fn(*args)
            hard_sync(o)
            return round((time.perf_counter() - t0) / reps * 1e3, 3)

        # numeric sanity before timing
        got = np.asarray(fwd_pair(p_t, adj))
        want = np.asarray(fwd_fact(p_s, adj))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        out[f"ub_{key}"] = {
            "fwd_pair_ms": timeit(fwd_pair, p_t, adj),
            "fwd_fact_ms": timeit(fwd_fact, p_s, adj),
            "fwdbwd_pair_ms": timeit(fwdbwd_pair, p_t, ct, adj),
            "fwdbwd_fact_ms": timeit(fwdbwd_fact, p_s, ct, adj),
            "fwd_max_rel_err": float(rel),
        }
        print(key, json.dumps(out[f"ub_{key}"]), flush=True)

    # --- full train step A/B ------------------------------------------
    cfg = TrainConfig(batch_size=512, scan_chunk=20)
    results = {}
    for impl in ("dense_factored", "paired"):
        model = DecagonModel(ModelConfig(spmm_impl=impl), dg)
        trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
        batches = []
        for b in trainer.scheduler.epoch():
            batches.append(b)
            if len(batches) >= 40:
                break
        losses = trainer.train_chunk(batches[:20], 20)
        hard_sync(losses)
        losses = trainer.train_chunk(batches[20:40], 20)
        hard_sync(losses)
        t = timed_chunks(trainer, batches, 20)
        results[impl] = {
            "ms_per_step_min": round(t["min_ms"], 3),
            "ms_per_step_median": round(t["median_ms"], 3),
            "loss_tail": [float(x) for x in np.asarray(losses)[-3:]],
        }
        print(impl, json.dumps(results[impl]), flush=True)
    out["step"] = results
    nnz = 12179510
    out["step"]["paired_edges_per_s"] = round(
        nnz / (results["paired"]["ms_per_step_min"] / 1e3), 1
    )
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "paired_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
