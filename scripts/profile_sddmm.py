"""Profile decoder (SDDMM) scoring at eval scale vs the encoder forward.

VERDICT round-1 item 8: BASELINE names "custom Pallas SpMM and SDDMM
kernels"; the SDDMM side is plain jnp (gather + small einsum).  This
records whether that is justified: at 963-relation eval scale the
scoring dispatch handles every relation's padded holdout in ONE call —
measure its share of total eval time.  If scoring is <5% of eval, jnp
is the right call (the op is a [B,d] gather + [B,d]x[d,d] einsum —
already MXU/memory-shaped with nothing for a kernel to fuse further).

Writes artifacts/perf/sddmm_profile.json.
"""

from __future__ import annotations

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
from decagon_tpu.train.evaluate import AccuracyEvaluator

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


from decagon_tpu.timing import hard_sync


def timed(fn, *args, reps=5):
    out = fn(*args)
    hard_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
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
    )
    # Baseline evaluator FORCED to the jnp scoring path ("auto" now
    # resolves to the compiled Pallas kernel on TPU — that path is timed
    # separately below).
    model = DecagonModel(
        ModelConfig(spmm_impl="auto", sddmm_impl="jnp"), dg
    )
    params = jax.jit(lambda r: model.init_params(r, dg))(jax.random.PRNGKey(0))
    ev = AccuracyEvaluator(model, graph, splits)

    # Encoder forward (once per evaluation); force a dependent scalar so
    # remote-attached async dispatch can't under-report.
    t_embed, emb = timed(
        lambda: jax.tree.map(jnp.sum, ev._embed(params, dg))
    )
    emb = ev._embed(params, dg)

    # Flat multi-relation scoring over ALL drug-drug holdout batches.
    dd = (1, 1)
    batches = [
        (key[2], split.val)
        for key, split in splits.items()
        if key[:2] == dd
    ]
    n_edges = sum(e.shape[0] for _, e in batches)

    # Cold: host assembly + host->device upload + dispatch.
    t0 = time.perf_counter()
    ev._probs_flat(params, emb, dd, batches, cache_key=("prof", "val"))
    t_score_cold = time.perf_counter() - t0

    # Warm: staged device-resident indices (the steady-state eval cost).
    def score():
        return ev._probs_flat(
            params, emb, dd, batches, cache_key=("prof", "val")
        )

    t_score, _ = timed(score, reps=5)

    # End-to-end evaluate_all (both polarities + metric computation).
    # Round 5: host AUROC/AUPRC are vectorized rank statistics
    # (train/evaluate.fast_auroc — sklearn parity-tested), replacing the
    # sklearn calls that were 97% of this number in r4 (1324 ms).
    ev.evaluate_all_drug_drug(params, dg, embeddings=emb)  # warm stage
    t_all0 = time.perf_counter()
    scores = ev.evaluate_all_drug_drug(params, dg, embeddings=emb)
    t_all = time.perf_counter() - t_all0

    # The PRODUCTION evaluator ("auto" -> compiled Pallas SDDMM on TPU)
    # end to end, warm: scoring + host metrics (VERDICT r4 #7 target
    # < 200 ms from r4's 1324 ms).
    t_all_auto = None
    if jax.default_backend() == "tpu":
        model_auto = DecagonModel(
            ModelConfig(spmm_impl="auto", sddmm_impl="auto",
                        sddmm_precision="default"), dg
        )
        ev_auto = AccuracyEvaluator(model_auto, graph, splits)
        emb_auto = ev_auto._embed(params, dg)
        ev_auto.evaluate_all_drug_drug(params, dg, embeddings=emb_auto)
        ev_auto.evaluate_all_drug_drug(params, dg, embeddings=emb_auto)
        t0 = time.perf_counter()
        ev_auto.evaluate_all_drug_drug(params, dg, embeddings=emb_auto)
        t_all_auto = time.perf_counter() - t0

    # Compiled Pallas one-hot SDDMM (round 4: gathers are MXU one-hot
    # matmuls — no tpu.dynamic_gather, so the round-3 Mosaic single-vreg
    # blocker is gone).  Time it COMPILED on the same flat holdout
    # stream at both precisions and check numerics against jnp.
    kernel = {"status": "not probed (cpu backend)"}
    if jax.default_backend() == "tpu":
        from decagon_tpu.ops import sddmm_pallas as sp

        dd_key = "1,1"
        dp = params["dec"][dd_key]
        ks_flat, rows_flat, cols_flat, _ = ev._stage(
            batches, cache_key=("prof", "flat")
        )
        z = emb["1"]

        jnp_ref = np.asarray(
            ev._score_fns[dd](params, emb, ks_flat, rows_flat, cols_flat)
        ).reshape(-1)[:n_edges]
        kernel = {}
        for precision in ("highest", "default"):
            try:
                fn = jax.jit(
                    lambda ks, r, c, z=z, precision=precision: (
                        jax.nn.sigmoid(
                            sp.sddmm_pallas_edges(
                                z, z, ks, r, c, name="dedicom",
                                glb=dp["global"],
                                rel_diag=dp["local_diag"],
                                precision=precision,
                            )
                        )
                    )
                )
                t_k, out = timed(fn, ks_flat, rows_flat, cols_flat)
                got = np.asarray(out).reshape(-1)[:n_edges]
                err = float(np.abs(got - jnp_ref).max())
                kernel[precision] = {
                    "compiled_ms": round(t_k * 1e3, 2),
                    "max_abs_prob_err_vs_jnp": round(err, 6),
                }
            except Exception as exc:  # noqa: BLE001
                kernel[precision] = {
                    "status": f"failed: {str(exc).splitlines()[0][:200]}"
                }

    # Bilinear (round 5): the flattened [K, d*d] one-hot gather — time
    # the kernel vs the XLA chunked-gather fallback on the same stream
    # with synthetic per-relation [d, d] matrices (the graph's (1,1)
    # decoder is dedicom; bilinear is BASELINE config 3's family).
    bilinear = {"status": "not probed (cpu backend)"}
    if jax.default_backend() == "tpu":
        from decagon_tpu.ops import sddmm_pallas as sp
        from decagon_tpu.ops.sddmm import sddmm_pairs

        rngb = np.random.default_rng(0)
        k_rel = dg.adj["1,1"].num_rel
        d = emb["1"].shape[1]
        rel_full = jnp.asarray(
            rngb.standard_normal((k_rel, d, d)), jnp.float32
        )
        z = emb["1"]
        ks_flat, rows_flat, cols_flat, _ = ev._stage(
            batches, cache_key=("prof", "flat")
        )

        def xla_bilinear(ks, r, c):
            def one(args):
                kk, rr, cc = args
                return sddmm_pairs(z[rr], z[cc], glb=rel_full[kk])
            return jax.lax.map(
                one,
                (ks.reshape(-1, 65536), r.reshape(-1, 65536),
                 c.reshape(-1, 65536)),
            )

        bilinear = {}
        try:
            fn_x = jax.jit(xla_bilinear)
            t_x, out_x = timed(fn_x, ks_flat, rows_flat, cols_flat)
            bilinear["xla_ms"] = round(t_x * 1e3, 2)
        except Exception as exc:  # noqa: BLE001
            bilinear["xla_ms"] = f"failed: {str(exc)[:160]}"
            out_x = None
        try:
            fn_k = jax.jit(
                lambda ks, r, c: sp.sddmm_pallas_edges(
                    z, z, ks, r, c, name="bilinear", rel_full=rel_full,
                    precision="default",
                )
            )
            t_k, out_k = timed(fn_k, ks_flat, rows_flat, cols_flat)
            bilinear["kernel_bf16_ms"] = round(t_k * 1e3, 2)
            if out_x is not None:
                a = np.asarray(out_k).reshape(-1)[:n_edges]
                b = np.asarray(out_x).reshape(-1)[:n_edges]
                denom = np.abs(b).max() + 1e-9
                bilinear["max_rel_err_vs_xla"] = round(
                    float(np.abs(a - b).max() / denom), 5
                )
        except Exception as exc:  # noqa: BLE001
            bilinear["kernel_bf16_ms"] = f"failed: {str(exc)[:160]}"

    share = t_score / (t_embed + t_score)
    best_kernel_ms = min(
        (v["compiled_ms"] for v in kernel.values()
         if isinstance(v, dict) and "compiled_ms" in v),
        default=None,
    )
    result = {
        "relations": len(batches),
        "scored_edges_per_polarity": int(n_edges),
        "encoder_forward_ms": round(t_embed * 1e3, 2),
        "sddmm_scoring_warm_ms": round(t_score * 1e3, 2),
        "sddmm_scoring_cold_ms_incl_upload": round(t_score_cold * 1e3, 2),
        "evaluate_all_warm_ms_incl_host_metrics": round(t_all * 1e3, 2),
        "evaluate_all_warm_ms_production_auto": (
            round(t_all_auto * 1e3, 2) if t_all_auto else None
        ),
        "sddmm_share_of_forward_plus_scoring": round(share, 4),
        "pallas_kernel_compiled": kernel,
        "bilinear": bilinear,
        "kernel_vs_jnp_speedup": (
            round(t_score * 1e3 / best_kernel_ms, 2)
            if best_kernel_ms else None
        ),
        "verdict": (
            "round 4: the one-hot-matmul Pallas SDDMM compiles under "
            "Mosaic and replaces the XLA gather path in production "
            "('auto' on TPU) — see pallas_kernel_compiled for measured "
            "ms and numerics at eval scale"
        ),
        "auroc_sanity": round(scores.auroc, 4),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "sddmm_profile.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
