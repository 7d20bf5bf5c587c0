"""Perf probe: per-step latency breakdown of the chunked train step.

Times, on the bench workload (dummy graph, 500 genes / 400 drugs / 3
drug-drug relations + transposes):

  a) the full chunked train step (fwd+bwd+Adam) — the bench number,
  b) encoder forward only, scanned (no grad),
  c) scoring-only step (fixed embeddings; grad+Adam over decoder),
  d) full step with Pallas SpMM.

Usage: python scripts/perf_probe.py [chunk]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.step import TrainConfig, make_chunked_train_step, make_optimizer
from decagon_tpu.train.trainer import Trainer


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main() -> None:
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    graph = make_synthetic_graph(n_genes=500, n_drugs=400, n_drugdrug_types=3, seed=0)
    splits = split_graph(graph, val_frac=0.05, test_frac=0.0, seed=1)

    impls = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "xla", "fused", "pallas", "fused_pallas"
    ]
    for impl in impls:
        device_graph = build_device_graph(
            graph, splits, tile_for_pallas=("pallas" in impl)
        )
        model = DecagonModel(
            ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl=impl),
            device_graph,
        )
        # bench pads the term/projected spaces to the 256-block grid
        jax.clear_caches()
        cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=chunk)
        trainer = Trainer(model, graph, splits, device_graph, cfg, seed=0)
        batches = list(trainer.scheduler.epoch())
        while len(batches) < chunk:
            batches += list(trainer.scheduler.epoch())

        t = timeit(lambda: trainer.train_chunk(batches[:chunk], chunk))
        print(f"[{impl}] full chunked step: {t / chunk * 1e3:.3f} ms/step")

        # encoder fwd only, scanned
        params = trainer.params

        @jax.jit
        def enc_scan(params, g, rng):
            def body(_, i):
                emb = model.embeddings(
                    params, g, jax.random.fold_in(rng, i), deterministic=False
                )
                return None, emb["1"][0, 0]

            _, outs = jax.lax.scan(body, None, jnp.arange(chunk))
            return outs

        t = timeit(lambda: enc_scan(params, device_graph, jax.random.PRNGKey(0)))
        print(f"[{impl}] encoder fwd only:  {t / chunk * 1e3:.3f} ms/step")

        # encoder fwd+bwd only, scanned
        @jax.jit
        def enc_grad_scan(params, g, rng):
            def loss(p, i):
                emb = model.embeddings(
                    p, g, jax.random.fold_in(rng, i), deterministic=False
                )
                return sum(jnp.sum(e * e) for e in emb.values())

            def body(_, i):
                return None, jax.grad(loss)(params, i)["enc1"]["1,1"][0, 0, 0]

            _, outs = jax.lax.scan(body, None, jnp.arange(chunk))
            return outs

        t = timeit(lambda: enc_grad_scan(params, device_graph, jax.random.PRNGKey(0)))
        print(f"[{impl}] encoder fwd+bwd:   {t / chunk * 1e3:.3f} ms/step")

        # full chunked step with a flattened (single-vector) Adam
        import optax
        from decagon_tpu.train.step import make_chunked_train_step

        flat_opt = optax.flatten(make_optimizer(cfg))
        flat_chunk = make_chunked_train_step(model, device_graph, cfg, flat_opt)
        opt_state = flat_opt.init(trainer.params)
        b = cfg.batch_size
        branch = jnp.zeros(chunk, jnp.int32)
        ks = jnp.zeros(chunk, jnp.int32)
        rows = jnp.zeros((chunk, b), jnp.int32)
        cols = jnp.zeros((chunk, b), jnp.int32)
        step_no = jnp.arange(chunk, dtype=jnp.int32)
        valid = jnp.ones(chunk, bool)

        state = [trainer.params, opt_state]

        def run_flat():
            p, s, losses = flat_chunk(
                state[0], state[1], device_graph, jax.random.PRNGKey(0),
                branch, ks, rows, cols, step_no, valid,
            )
            state[0], state[1] = p, s
            return losses

        t = timeit(run_flat)
        print(f"[{impl}] step w/ flat Adam: {t / chunk * 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
