"""UNCONTENDED 2-process boundary-exchange overlap A/B (VERDICT r4 #2/#5).

Two processes, one per core (taskset-pinned — this host has exactly 2
cores, so unlike multihost_bench.py's 4-process run nothing is
oversubscribed), gloo collectives over localhost, mid-scale graph
(2000 proteins / 400 drugs / 50 relations), row-sharded mesh (row=2,
edge=1) — the all_gather over the row axis IS the boundary exchange.

Measures steady-state ms/step for:

  overlap_on    encode_sharded's two-phase structure (default): every
                edge type's local aggregation is emitted before anything
                consumes a gathered table, so the exchange can overlap
                the next edge type's einsum
  overlap_off   optimization_barrier chains serialize each edge type's
                collective behind the next one's compute (the control)
  inprocess     same program, ONE process with 2 CPU devices
                (collectives are in-process memcpys) — the compute-only
                reference that bounds the communication share

Writes artifacts/perf/multihost_overlap.json with the measured overlap
factor for scaling_model.py.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 24


def worker(pid, nproc, port, overlap, steps):
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
            + " --xla_force_host_platform_device_count=2"
        )
    assert jax.device_count() == 2, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.parallel.rowshard import build_sharded_device_graph
    from decagon_tpu.parallel.sharded import (
        make_sharded_train_step,
        pad_relation_stacks,
    )
    from decagon_tpu.train.step import TrainConfig, make_optimizer

    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7,
        planted_rank=16,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 1), ("row", "edge"))
    sg = build_sharded_device_graph(graph, splits, mesh)
    model = DecagonModel(
        ModelConfig(hidden1=64, hidden2=32, dropout=0.1), sg
    )
    params = model.init_params(jax.random.PRNGKey(0), sg)
    cfg = TrainConfig(
        batch_size=512, learning_rate=1e-3,
        comm_overlap=bool(overlap),
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
    t_first = t_steady = None
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


def run_config(nproc, overlap, steps=STEPS):
    port = _free_port()
    have_taskset = shutil.which("taskset") is not None
    procs = []
    for pid in range(nproc):
        argv = [
            sys.executable, __file__, "worker", str(pid), str(nproc),
            str(port), str(int(overlap)), str(steps),
        ]
        if have_taskset and nproc > 1:
            # one core per process: UNCONTENDED by construction
            argv = ["taskset", "-c", str(pid)] + argv
        procs.append(
            subprocess.Popen(
                argv, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    results = {}
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
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
        "first_step_s": results[0]["first_step_s"],
        "steady_ms_per_step": max(
            r["steady_ms_per_step"] for r in results.values()
        ),
        "loss_head": results[0]["losses"][:3],
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]), int(sys.argv[6]),
        )
        return
    t0 = time.perf_counter()
    out = {
        "config": {
            "graph": "2000 prot / 400 drugs / 50 rels (planted_rank 16)",
            "mesh": "(row=2, edge=1)",
            "steps": STEPS,
            "pinning": "taskset 1 core/process (2-core host, "
                       "uncontended)",
        }
    }
    out["overlap_on"] = run_config(2, overlap=True)
    print("overlap_on", out["overlap_on"], flush=True)
    out["overlap_off"] = run_config(2, overlap=False)
    print("overlap_off", out["overlap_off"], flush=True)
    out["inprocess_2dev"] = run_config(1, overlap=True)
    print("inprocess", out["inprocess_2dev"], flush=True)

    on = out["overlap_on"]["steady_ms_per_step"]
    off = out["overlap_off"]["steady_ms_per_step"]
    inp = out["inprocess_2dev"]["steady_ms_per_step"]
    comm_share_upper = max(0.0, (off - inp) / off)
    out["derived"] = {
        "overlap_gain_fraction": round((off - on) / off, 4),
        "comm_share_upper_bound": round(comm_share_upper, 4),
        "overlap_factor": round(
            (off - on) / max(1e-9, off - inp), 4
        ) if off > inp else None,
        "note": (
            "overlap_gain_fraction = wall saved by letting the "
            "boundary exchange overlap local aggregation; "
            "comm_share_upper_bound = (serialized - inprocess)/"
            "serialized, an upper bound on the gloo exchange share; "
            "overlap_factor = fraction of the exposed communication "
            "hidden by the two-phase schedule"
        ),
    }
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    path = os.path.join(REPO, "artifacts", "perf", "multihost_overlap.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
