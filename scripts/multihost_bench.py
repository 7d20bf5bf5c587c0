"""4-process multi-host simulation bench (VERDICT r3 item 6).

Extends the 2-process correctness sim (``multihost_sim.py``) to FOUR
processes (one CPU device each, gloo collectives over localhost) on the
mid-scale poly50 graph, across mesh shapes (2,2), (4,1), (1,4):

* cross-process EXACTNESS: every process computes the identical psum'd
  loss trace, and the (2,2) trace matches the single-process 4-virtual-
  device trace step for step;
* bf16 gradient reduction on a mesh with REAL row-axis traffic (nr=2):
  loss-trace drift vs fp32 reduction over N steps (ADVICE r3: the only
  prior bf16 evidence was an nr=1 mesh with zero row-axis bytes);
* per-step wall time per config.  CAVEAT, recorded in the artifact:
  this host has 2 CPU cores, so 4 concurrent processes oversubscribe
  ~2x and the absolute times measure core contention + gloo, not a pod
  slice; the contention-free communication evidence is the compiled-HLO
  collective inventory (``hlo_collectives.py``).

Driver:  python scripts/multihost_bench.py            (spawns workers)
Worker:  python scripts/multihost_bench.py worker <pid> <n> <port> \
             <nr> <ne> <dtype> <steps>

Writes artifacts/perf/multihost_bench.json.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 24


def worker(pid, nproc, port, nr, ne, dtype, steps):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from decagon_tpu.parallel.mesh import initialize_distributed

    if nproc > 1:
        initialize_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    else:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={nr * ne}"
        )
    assert jax.device_count() == nr * ne, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.parallel.rowshard import build_sharded_device_graph
    from decagon_tpu.parallel.sharded import make_sharded_train_step
    from decagon_tpu.train.step import TrainConfig, make_optimizer

    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7,
        planted_rank=16,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    mesh = Mesh(np.array(jax.devices()).reshape(nr, ne), ("row", "edge"))
    sg = build_sharded_device_graph(graph, splits, mesh)
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1), sg
    )
    from decagon_tpu.parallel.sharded import pad_relation_stacks

    params = model.init_params(jax.random.PRNGKey(0), sg)
    cfg = TrainConfig(
        batch_size=512, learning_rate=1e-3, grad_reduce_dtype=dtype,
    )
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params = pad_relation_stacks(params, sg)
    opt_state = {
        "m": pad_relation_stacks(opt_state["m"], sg),
        "v": pad_relation_stacks(opt_state["v"], sg),
        "t": opt_state["t"],
    }
    step = make_sharded_train_step(
        model, (1, 1), cfg, opt, mesh, sg, shard_weights=True,
    )
    train = splits[(1, 1, 0)].train
    rng = np.random.default_rng(0)
    batches = [
        train[rng.integers(0, len(train), 512)] for _ in range(steps)
    ]
    base = jax.random.PRNGKey(0)
    losses = []
    t_first = None
    for i, b in enumerate(batches):
        t0 = time.perf_counter()
        params, opt_state, loss = step(
            params, opt_state, sg, jnp.int32(0),
            jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]), base, jnp.int32(i),
        )
        losses.append(float(loss))  # sync
        if i == 0:
            t_first = time.perf_counter() - t0
        elif i == 1:
            t_steady = time.perf_counter()
    steady = (time.perf_counter() - t_steady) / max(1, steps - 1)
    print(
        "RESULT " + json.dumps({
            "pid": pid, "losses": [round(l, 6) for l in losses],
            "first_step_s": round(t_first, 2),
            "steady_ms_per_step": round(steady * 1e3, 1),
        }),
        flush=True,
    )


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_config(nr, ne, nproc, dtype, steps=STEPS):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", str(pid), str(nproc),
             str(port), str(nr), str(ne), dtype, str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    results = {}
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results[pid] = json.loads(line[len("RESULT "):])
    assert len(results) == nproc, results.keys()
    traces = {tuple(r["losses"]) for r in results.values()}
    assert len(traces) == 1, "processes disagree on the psum'd loss"
    return {
        "losses": results[0]["losses"],
        "first_step_s": results[0]["first_step_s"],
        "steady_ms_per_step": max(
            r["steady_ms_per_step"] for r in results.values()
        ),
    }


def main():
    t0 = time.perf_counter()
    out = {
        "caveat": (
            "2-core host: 4 concurrent processes oversubscribe ~2x; "
            "steady_ms_per_step measures gloo + core contention, not "
            "pod-slice comm (see hlo_collectives.json for the "
            "contention-free traffic inventory)"
        ),
        "workload": "poly50, batch 512, weight-sharded step",
        "configs": {},
    }

    def log(tag, r):
        print(f"[mh +{time.perf_counter() - t0:.0f}s] {tag}: "
              f"{r['steady_ms_per_step']} ms/step", flush=True)

    for tag, (nr, ne, nproc, dtype) in {
        "1proc_4dev_2x2": (2, 2, 1, "float32"),
        "4proc_2x2": (2, 2, 4, "float32"),
        "4proc_2x2_bf16": (2, 2, 4, "bfloat16"),
        "4proc_4x1": (4, 1, 4, "float32"),
        "4proc_1x4": (1, 4, 4, "float32"),
    }.items():
        r = run_config(nr, ne, nproc, dtype)
        out["configs"][tag] = r
        log(tag, r)

    a = out["configs"]["1proc_4dev_2x2"]["losses"]
    b = out["configs"]["4proc_2x2"]["losses"]
    out["cross_process_equals_single_process"] = bool(
        max(abs(x - y) for x, y in zip(a, b)) < 1e-4
    )
    f32 = out["configs"]["4proc_2x2"]["losses"]
    bf16 = out["configs"]["4proc_2x2_bf16"]["losses"]
    out["bf16_reduce_drift"] = {
        "max_abs": round(max(abs(x - y) for x, y in zip(f32, bf16)), 5),
        "final_rel": round(abs(f32[-1] - bf16[-1]) / abs(f32[-1]), 5),
        "note": "nr=2 mesh: the row-axis enc-grad psum really runs in "
                "bf16 here (the nr=1 gate skips the cast)",
    }
    path = os.path.join(REPO, "artifacts", "perf", "multihost_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "configs"}))
    print("wrote", path)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(*[
            int(a) if a.isdigit() else a for a in sys.argv[2:9]
        ])
    else:
        main()
