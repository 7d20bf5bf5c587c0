"""Optimizer-cost probe on the full-scale workload (VERDICT r2 weak #3).

The round-2 step profile (RTT-corrected) attributes ~20 of the 39 ms
full-scale train step to the Adam update — the fwd+bwd SpMM passes are
already near the HBM roofline.  This probe times PIPELINED (dependent
chains, one trailing sync — no per-step RTT) variants of the optimizer
on the real parameter pytree:

  adam_flatten   optax.flatten(optax.adam)  (shipped round-2 config)
  adam_plain     optax.adam (per-leaf, no ravel/relayout copies)
  adam_fused     decagon_tpu.ops.adam_pallas fused single-pass kernel

plus fwd_bwd and the end-to-end step per optimizer, so the winner's
step-level effect is measured, not inferred.

Usage: python scripts/probe_adam.py [--relations 963]
Writes artifacts/perf/adam_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.losses import LOSSES
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.timing import hard_sync
from decagon_tpu.train.negatives import sample_unigram
from decagon_tpu.train.step import TrainConfig

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


def timed_pipelined(fn, state, n=12, warmup=2):
    """ms per call of ``state = fn(state)`` over a dependent chain."""
    for _ in range(warmup):
        state = fn(state)
    hard_sync(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    hard_sync(state)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relations", type=int, default=963)
    args = ap.parse_args()
    t0 = time.time()

    def log(m):
        print(f"[probe_adam +{time.time() - t0:.0f}s] {m}", flush=True)

    graph = make_polypharmacy_like_graph(
        n_proteins=19081, n_drugs=645, n_side_effects=args.relations,
        min_edges_per_relation=500, total_drugdrug_edges=4_651_131,
        ppi_attachment=37, seed=7,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, densify_max_cells=1_000_000_000,
        dense_dtype=jnp.bfloat16, build_fused=False,
    )
    log("device graph built")
    model = DecagonModel(ModelConfig(spmm_impl="auto"), dg)
    cfg = TrainConfig(batch_size=512)
    params = jax.jit(lambda r: model.init_params(r, dg))(jax.random.PRNGKey(0))
    param_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params)
    )
    log(f"params: {param_bytes / 2**20:.0f} MiB logical")

    rows = jnp.asarray(
        np.random.default_rng(0).integers(0, 645, size=512), jnp.int32
    )
    cols = jnp.asarray(
        np.random.default_rng(1).integers(0, 645, size=512), jnp.int32
    )
    k = jnp.int32(0)
    et = (1, 1)

    def loss_fn(params, g, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        emb = model.embeddings(params, g, enc_rng, deterministic=False)
        pos = model.score_edges(params, g, emb, et, k, rows, cols)
        neg_rows = sample_unigram(sample_rng, g.neg_cdf["1,1"][k], 512)
        neg = model.score_edges(params, g, emb, et, k, neg_rows, cols)
        return LOSSES["hinge"](pos, neg, cfg.margin)

    grad_fn = jax.value_and_grad(loss_fn)

    # NEVER close over the device graph in a jitted fn: the remote
    # compile endpoint rejects >3 GB captured constants (HTTP 413) —
    # pass it through the carry instead (weak refs via donate unused).
    @jax.jit
    def fwd_bwd_chain(carry, g):
        params, rng = carry
        rng = jax.random.fold_in(rng, 1)
        loss, grads = grad_fn(params, g, rng)
        # keep the chain dependent without an optimizer
        params = jax.tree_util.tree_map(lambda p, gr: p - 0.0 * gr, params, grads)
        return params, rng

    result = {"param_mib": round(param_bytes / 2**20, 1)}
    result["fwd_bwd_ms"] = round(
        timed_pipelined(
            lambda c: fwd_bwd_chain(c, dg), (params, jax.random.PRNGKey(1))
        ),
        3,
    )
    log(f"fwd_bwd {result['fwd_bwd_ms']} ms")

    _, grads0 = jax.jit(grad_fn)(params, dg, jax.random.PRNGKey(1))
    hard_sync(grads0)

    from decagon_tpu.ops.optim import fused_adam

    variants = {
        "adam_flatten": optax.flatten(
            optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
        ),
        "adam_plain": optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8),
        "adam_fused": fused_adam(1e-3, b1=0.9, b2=0.999, eps=1e-8),
    }

    for name, opt in variants.items():
        opt_state = jax.jit(opt.init)(params)
        hard_sync(opt_state)

        @jax.jit
        def adam_chain(carry, g0, _opt=opt):
            p, s = carry
            updates, s = _opt.update(g0, s, p)
            return optax.apply_updates(p, updates), s

        result[f"{name}_ms"] = round(
            timed_pipelined(
                lambda c: adam_chain(c, grads0),
                (jax.tree.map(jnp.copy, params), opt_state),
            ),
            3,
        )
        log(f"{name} {result[f'{name}_ms']} ms")

        @jax.jit
        def step_chain(carry, g, _opt=opt):
            p, s, rng = carry
            rng = jax.random.fold_in(rng, 1)
            loss, grads = grad_fn(p, g, rng)
            updates, s = _opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, rng

        result[f"step_{name}_ms"] = round(
            timed_pipelined(
                lambda c: step_chain(c, dg),
                (jax.tree.map(jnp.copy, params), opt_state, jax.random.PRNGKey(2)),
            ),
            3,
        )
        log(f"step_{name} {result[f'step_{name}_ms']} ms")

    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "adam_probe.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
