"""Ablation profile of the full-scale dense train step.

Breaks the 39 ms/step (bench.py full_dense_bf16) into attributable
pieces by timing jitted sub-computations on the same graph + params:

  fwd          deterministic 2-layer forward
  fwd_drop     forward with dropout masks (train-path forward)
  fwd_bwd      value_and_grad of the hinge loss (no optimizer)
  full_step    fwd+bwd + Adam (the real train step, single dispatch)
  adam_only    optimizer.update + apply on cached grads

Usage: python scripts/profile_fullscale_step.py [--relations 963]
Writes artifacts/perf/fullscale_step_profile.json.
"""

from __future__ import annotations

import argparse
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
from decagon_tpu.models.losses import LOSSES
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.negatives import sample_unigram
from decagon_tpu.train.step import TrainConfig, make_optimizer

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "perf",
)


from decagon_tpu.timing import hard_sync


def timed(fn, *args, reps: int = 10, warmup: int = 2) -> float:
    """Pipelined ms/call: `reps` back-to-back dispatches, ONE trailing
    hard sync — the host<->TPU tunnel RTT (~28 ms) amortizes across the
    window instead of polluting every sample (the round-2 artifact's
    numbers each carried a full RTT)."""
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relations", type=int, default=963)
    args = ap.parse_args()

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
    )
    # "auto" on TPU resolves to the int8 factored stacks (round 4);
    # the artifact profiles the production dispatch.
    model = DecagonModel(ModelConfig(spmm_impl="auto"), dg)
    cfg = TrainConfig(batch_size=512)
    optimizer = make_optimizer(cfg)
    params = jax.jit(lambda r: model.init_params(r, dg))(
        jax.random.PRNGKey(0)
    )
    opt_state = jax.jit(optimizer.init)(params)

    rng = jax.random.PRNGKey(1)
    rows = jnp.asarray(
        np.random.default_rng(0).integers(0, 645, size=512), jnp.int32
    )
    cols = jnp.asarray(
        np.random.default_rng(1).integers(0, 645, size=512), jnp.int32
    )
    k = jnp.int32(0)
    et = (1, 1)

    @jax.jit
    def fwd(params, g):
        return model.embeddings(params, g, deterministic=True)

    @jax.jit
    def fwd_drop(params, g, rng):
        return model.embeddings(params, g, rng, deterministic=False)

    def loss_fn(params, g, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        emb = model.embeddings(params, g, enc_rng, deterministic=False)
        pos = model.score_edges(params, g, emb, et, k, rows, cols)
        neg_rows = sample_unigram(
            sample_rng, g.neg_cdf["1,1"][k], cfg.batch_size
        )
        neg = model.score_edges(params, g, emb, et, k, neg_rows, cols)
        return LOSSES["hinge"](pos, neg, cfg.margin)

    fwd_bwd = jax.jit(jax.value_and_grad(loss_fn, argnums=0))

    import optax

    @jax.jit
    def full_step(params, opt_state, g, rng):
        loss, grads = jax.value_and_grad(loss_fn, argnums=0)(params, g, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from decagon_tpu.timing import hard_sync
    _, grads = fwd_bwd(params, dg, rng)
    hard_sync(grads)

    @jax.jit
    def adam_only(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    result = {
        "fwd_ms": round(timed(fwd, params, dg), 3),
        "fwd_drop_ms": round(timed(fwd_drop, params, dg, rng), 3),
        "fwd_bwd_ms": round(timed(fwd_bwd, params, dg, rng), 3),
        "adam_only_ms": round(timed(adam_only, params, opt_state, grads), 3),
        "full_step_ms": round(timed(full_step, params, opt_state, dg, rng), 3),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "fullscale_step_profile.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
