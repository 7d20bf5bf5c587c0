"""Two-process multi-host simulation worker (CPU, gloo collectives).

Each process owns ONE CPU device; the global (2, 1) mesh lays the
``row`` axis across processes — the destination-row-block all_gather
rides the cross-process channel exactly like DCN on a real pod slice.
Runs one full sharded train step + the sharded eval forward and checks
the loss/embeddings against the single-device computation.

Launched by tests/test_multihost.py (or by hand):

    python scripts/multihost_sim.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Exactly ONE local device per process (drop any inherited virtual-mesh
# flag from the test harness).
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from decagon_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.device_count() == nproc, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.parallel.rowshard import build_sharded_device_graph
    from decagon_tpu.parallel.sharded import (
        make_sharded_embed_fn,
        make_sharded_train_step,
    )
    from decagon_tpu.train.step import TrainConfig, make_optimizer

    # Deterministic world on every process (same seeds).
    graph = make_synthetic_graph(
        n_genes=64, n_drugs=32, n_drugdrug_types=1, seed=1
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.05, seed=2)
    device_graph = build_device_graph(graph, splits, edge_pad_multiple=256)
    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8), device_graph)
    params = model.init_params(jax.random.PRNGKey(0), device_graph)

    # row axis ACROSS processes (the DCN axis), edge axis within.
    mesh = Mesh(np.array(jax.devices()).reshape(nproc, 1), ("row", "edge"))
    sharded_graph = build_sharded_device_graph(graph, splits, mesh)

    batch = 16
    cfg = TrainConfig(batch_size=batch, learning_rate=1e-3)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(
        model, (1, 1), cfg, optimizer, mesh, sharded_graph
    )
    train = splits[(1, 1, 0)].train
    idx = np.random.default_rng(0).integers(0, len(train), size=batch)
    rows = jnp.asarray(train[idx, 0])
    cols = jnp.asarray(train[idx, 1])
    new_params, _, loss = step(
        jax.tree.map(jnp.copy, params), opt_state, sharded_graph,
        jnp.int32(0), rows, cols, jax.random.PRNGKey(0), jnp.int32(0),
    )
    loss = float(loss)
    assert np.isfinite(loss), loss

    # Deterministic sharded forward vs local single-device forward.
    emb = make_sharded_embed_fn(model, mesh, sharded_graph)(
        params, sharded_graph
    )
    want = model.embeddings(params, device_graph, deterministic=True)
    for key in want:
        # Replicated output: this process's addressable shard IS the
        # full table; it must match the local single-device forward.
        got = np.asarray(emb[key].addressable_shards[0].data)
        np.testing.assert_allclose(
            got, np.asarray(want[key]), rtol=2e-5, atol=1e-6
        )
    print(f"MULTIHOST_OK pid={pid} loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
