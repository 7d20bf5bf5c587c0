"""Dense-INFEASIBLE regime bench: Pallas tiled SpMM vs XLA segment-sum
(VERDICT r3 item 4 — "benchmark the Pallas SpMM where dense cannot go").

Three configs, all with the full 963-relation schema and paper protein
scale (19081 proteins):

* ``paper_cap`` (645 drugs, 4.65M dd edges — the paper workload with
  ``densify_max_cells=0``, VERDICT r3's "DensifyMaxCells capped"
  framing: HBM reserved for other tenants / no dense stacks): the
  kernel vs its real competitor, XLA gather+segment-sum, head to head
  on the full train step (fwd+bwd+Adam, scanned chunk), both kernel
  precisions ("default" = the round-4 bf16 source windows).
* ``beyond_paper`` (1600 drugs, ~6M dd edges): the dense stack would
  be 9.2 GB bf16 (impossible next to params+activations) AND XLA
  segment-sum itself OOMs (measured 17.9 G of 15.75 G — its gathered
  [E, H] message array + residuals); the tiled kernel is the only
  viable implementation and its throughput is recorded.
* ``xla_infeasible`` (2500 drugs, ~8M dd edges): same, further out
  (dense stack would be 22.4 GB; XLA needs 21.8 G); the kernel trains
  at 492 ms/step, and the ``remat=True`` variant shows the
  memory/compute trade that extends the envelope beyond even that.

Writes artifacts/perf/sparse_regime_bench.json (referenced by
bench.py's output as ``sparse_regime_ref``).
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
from decagon_tpu.ops.tiling import tiling_stats
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


def run_config(n_drugs, dd_edges, impls, chunk=10, share_state=True,
               renumber=False):
    build_t0 = time.perf_counter()
    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=n_drugs, n_side_effects=963,
        min_edges_per_relation=500, total_drugdrug_edges=dd_edges,
        ppi_attachment=37, seed=7,
    )
    if renumber:
        # Degree-clustered relabeling (PALLAS_NOTE lever 1): hot source
        # rows concentrate at low indices, so the kernel's contiguous
        # source windows carry more real edges per DMA.
        from decagon_tpu.graph.renumber import renumber_by_degree

        graph, _ = renumber_by_degree(graph)
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
    stack_gb = dd.num_rel * dd.n_rows * dd.n_cols * 2 / 2**30
    log(f"[{n_drugs} drugs] built in {build_s:.0f}s; nnz={nnz}; dd "
        f"dense stack would be {stack_gb:.1f} GB bf16 (HBM 15.75)")
    out = {
        "workload": (
            f"19081 prot / {n_drugs} drugs / 963 rels x2, nnz={nnz}; "
            f"dd dense stack would be {stack_gb:.1f} GB bf16 vs 15.75 "
            "GB HBM (dense path impossible)"
        ),
        "host_build_s": round(build_s, 1),
        "renumbered": bool(renumber),
        "occupancy": {
            key: round(tiling_stats(a.tiles_fwd)["occupancy"], 3)
            for key, a in dg.adj.items()
            if a.tiles_fwd is not None
        },
    }
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=chunk)
    shared_state = None
    for spec in impls:
        tag, impl, precision = spec[:3]
        extra = spec[3] if len(spec) > 3 else {}
        model = DecagonModel(
            ModelConfig(
                hidden1=64, hidden2=32, dropout=0.1,
                spmm_impl=impl, spmm_precision=precision, **extra,
            ),
            dg,
        )
        trainer = None
        try:
            trainer = Trainer(
                model, graph, splits, dg, cfg, seed=0,
                init_state=None if shared_state is None
                else jax.tree.map(jnp.copy, shared_state),
            )
            if share_state and shared_state is None:
                # Identical start params across impls — costs a full
                # state-tree copy in HBM (~3.7 GB at 2500 drugs), so
                # the memory-critical config opts out.
                shared_state = jax.tree.map(
                    jnp.copy, trainer.state_dict()
                )
            ms = steady_ms(trainer, chunk=chunk)
            out[tag] = {
                "ms_per_step_min": round(ms, 2),
                "edges_per_s": round(nnz / (ms / 1e3), 1),
            }
        except Exception as exc:  # noqa: BLE001
            first = str(exc).splitlines()
            msg = next(
                (l for l in first if "memory" in l.lower()), first[0]
            )
            out[tag] = {"failed": msg.strip()[:300]}
        finally:
            # A runtime-OOM'd attempt leaves multi-GB params/opt-state
            # referenced (round 4's xla attempt failed at COMPILE and
            # allocated nothing; bf16 moments shrank the program enough
            # to fail at RUNTIME instead, starving the NEXT impl) —
            # drop everything it pinned before trying the next one.
            import gc

            del trainer, model
            gc.collect()
        log(f"{tag}: {out[tag]}")
    return out


CONFIGS = {
    "paper_cap": dict(
        n_drugs=645, dd_edges=4_651_131,
        impls=[("xla", "xla", "highest"),
               ("pallas_bf16", "pallas", "default"),
               ("pallas_f32", "pallas", "highest")],
    ),
    "beyond_paper": dict(
        n_drugs=1600, dd_edges=6_000_000,
        # xla LAST: bf16 moments shrank its program under the r4
        # compile-OOM threshold, so it now RUNTIME-OOMs — and a failed
        # execution's buffers outlive gc, starving any impl tried after
        # it on the single chip.
        impls=[("pallas_bf16", "pallas", "default"),
               ("pallas_f32", "pallas", "highest"),
               ("xla", "xla", "highest")],
    ),
    # round 5: degree-clustered renumbering A/B on the kernel path
    "paper_cap_renumbered": dict(
        n_drugs=645, dd_edges=4_651_131,
        impls=[("pallas_bf16", "pallas", "default")],
        renumber=True,
    ),
    "beyond_paper_renumbered": dict(
        n_drugs=1600, dd_edges=6_000_000,
        impls=[("pallas_bf16", "pallas", "default")],
        renumber=True,
    ),
    "xla_infeasible": dict(
        n_drugs=2500, dd_edges=8_000_000,
        impls=[("xla", "xla", "highest"),
               ("pallas_bf16", "pallas", "default"),
               ("pallas_bf16_remat", "pallas", "default",
                {"remat": True})],
        share_state=False,
    ),
}


def main():
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run ONE named config in this process")
    args = ap.parse_args()
    if args.only:
        out = {args.only: run_config(**CONFIGS[args.only])}
        path = os.path.join(
            ROOT, "artifacts", "perf", f"_sparse_{args.only}.json"
        )
        with open(path, "w") as f:
            json.dump(out, f)
        print(f"wrote {path}")
        return

    # Each config runs in a FRESH process: a failed (OOM'd) trainer's
    # buffers and the previous config's jit-cache constants otherwise
    # accumulate on the single chip and starve later configs.
    out = {}
    for name in CONFIGS:
        r = subprocess.run(
            [sys.executable, __file__, "--only", name], timeout=1800,
        )
        part_path = os.path.join(
            ROOT, "artifacts", "perf", f"_sparse_{name}.json"
        )
        if r.returncode == 0 and os.path.exists(part_path):
            with open(part_path) as f:
                out.update(json.load(f))
            os.remove(part_path)
        else:
            out[name] = {"failed": f"subprocess rc={r.returncode}"}
    h = out["paper_cap"]
    if "ms_per_step_min" in h.get("xla", {}) and             "ms_per_step_min" in h.get("pallas_bf16", {}):
        h["pallas_vs_xla"] = round(
            h["xla"]["ms_per_step_min"]
            / h["pallas_bf16"]["ms_per_step_min"], 2
        )
    # Summary fields bench.py lifts into its output.
    out["workload"] = out["paper_cap"].get("workload")
    out["xla"] = out["paper_cap"].get("xla")
    out["pallas_bf16"] = out["paper_cap"].get("pallas_bf16")
    out["pallas_vs_xla"] = out["paper_cap"].get("pallas_vs_xla")
    path = os.path.join(ROOT, "artifacts", "perf", "sparse_regime_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
