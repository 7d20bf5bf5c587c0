"""Perf probe 2: RNG impl, dropout cost, tile size on the bench workload."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax

if "rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.step import TrainConfig
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
    chunk = 50
    tile_block = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng_tag = "rbg" if "rbg" in sys.argv else "threefry"
    graph = make_synthetic_graph(n_genes=500, n_drugs=400, n_drugdrug_types=3, seed=0)
    splits = split_graph(graph, val_frac=0.05, test_frac=0.0, seed=1)

    impl = "pallas"
    device_graph = build_device_graph(
        graph, splits, tile_for_pallas=True, tile_block=tile_block
    )
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1, spmm_impl=impl),
        device_graph,
    )
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3, scan_chunk=chunk)
    trainer = Trainer(model, graph, splits, device_graph, cfg, seed=0)
    batches = list(trainer.scheduler.epoch())
    while len(batches) < chunk:
        batches += list(trainer.scheduler.epoch())

    t = timeit(lambda: trainer.train_chunk(batches[:chunk], chunk))
    print(f"[{impl} tb={tile_block} {rng_tag}] full chunked step: "
          f"{t / chunk * 1e3:.3f} ms/step")

    params = trainer.params

    for det in (False, True):
        @jax.jit
        def enc_scan(params, g, rng, det=det):
            def body(_, i):
                emb = model.embeddings(
                    params, g,
                    None if det else jax.random.fold_in(rng, i),
                    deterministic=det,
                )
                return None, emb["1"][0, 0]

            _, outs = jax.lax.scan(body, None, jnp.arange(chunk))
            return outs

        t = timeit(lambda: enc_scan(params, device_graph, jax.random.PRNGKey(0)))
        print(f"[{impl} tb={tile_block} {rng_tag}] encoder fwd "
              f"det={det}: {t / chunk * 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
