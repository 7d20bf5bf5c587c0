"""Dissect the sharded-step overhead vs single-chip (VERDICT r2 item 1).

Times matched ablations of the single-device and (1,1)-mesh sharded
paths on the bench_sharded workload so the 29x gap can be attributed:
full step, grads-only, encoder forward only, dropout off.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from decagon_tpu.timing import hard_sync
from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer


def timeit(fn, *args, n=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=1)
    dg = build_device_graph(
        graph, splits, densify_max_cells=400_000_000, build_fused=False
    )
    model = DecagonModel(ModelConfig(spmm_impl="auto"), dg)
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3)
    res = {"backend": jax.default_backend()}

    single = Trainer(model, graph, splits, dg, cfg, seed=0)
    batches = list(single.scheduler.epoch())[:8]

    # --- single full step
    b = batches[0]
    res["single_step_ms"] = timeit(lambda: single.train_batch(b) and None or single.params)

    # --- single encoder fwd (deterministic)
    embed_single = jax.jit(
        lambda p, g: model.embeddings(p, g, deterministic=True)
    )
    res["single_embed_ms"] = timeit(embed_single, single.params, dg)

    # --- single encoder fwd WITH dropout
    embed_single_do = jax.jit(
        lambda p, g, r: model.embeddings(p, g, rng=r, deterministic=False)
    )
    rng = jax.random.PRNGKey(0)
    res["single_embed_dropout_ms"] = timeit(embed_single_do, single.params, dg, rng)

    from decagon_tpu.parallel.mesh import make_mesh
    from decagon_tpu.parallel.rowshard import build_sharded_device_graph
    from decagon_tpu.parallel.sharded import (
        make_sharded_embed_fn,
        make_sharded_train_step,
        encode_sharded,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    shape = (1, 1) if len(jax.devices()) == 1 else (2, 4)
    mesh = make_mesh(shape=shape)
    sgraph = build_sharded_device_graph(
        graph, splits, mesh, densify_max_cells_per_device=400_000_000
    )
    state = jax.tree.map(jnp.copy, single.state_dict())
    st = Trainer(
        model, graph, splits, sgraph, cfg, seed=0, mesh=mesh, init_state=state
    )
    res["sharded_step_ms"] = timeit(lambda: st.train_batch(b) and None or st.params)

    # --- sharded encoder fwd (deterministic)
    embed_sh = make_sharded_embed_fn(model, mesh, sgraph)
    res["sharded_embed_ms"] = timeit(embed_sh, st.params, sgraph)

    # --- sharded encoder fwd WITH dropout
    import jax.sharding as jsh
    from decagon_tpu.parallel.rowshard import sharded_pspecs

    g_specs = sharded_pspecs(sgraph)
    mc = model.config

    def local_do(params, g, r):
        return encode_sharded(
            params, g, r, dropout_rate=mc.dropout, deterministic=False,
            spmm_impl=mc.spmm_impl,
            per_relation_dropout_max=mc.per_relation_dropout_max,
            spmm_precision=mc.spmm_precision,
        )

    embed_sh_do = jax.jit(
        jax.shard_map(
            local_do, mesh=mesh, in_specs=(P(), g_specs, P()),
            out_specs=P(), check_vma=False,
        )
    )
    res["sharded_embed_dropout_ms"] = timeit(embed_sh_do, st.params, sgraph, rng)

    # cost analysis of the two full steps
    for name, tr in (("single", single), ("sharded", st)):
        fn = tr.steps[b.edge_type]
        try:
            lowered = fn.lower(
                tr.params, tr.opt_state, tr.device_graph,
                jnp.int32(b.k), jnp.asarray(b.rows), jnp.asarray(b.cols),
                jax.random.PRNGKey(1),
            )
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            res[f"{name}_cost"] = {
                k: ca.get(k) for k in ("flops", "bytes accessed", "transcendentals")
            }
        except Exception as e:  # noqa: BLE001
            res[f"{name}_cost"] = f"error: {e}"

    print(json.dumps(res, indent=1, default=str))


if __name__ == "__main__":
    main()
