"""HLO-schedule probe for the boundary-exchange overlap.

OUTCOME (recorded in the artifact): the XLA:CPU backend lowers every
collective synchronously — zero -start/-done pairs exist in its
optimized HLO — and multi-chip TPU programs cannot be compiled through
the single-chip tunnel, so compiled-schedule async evidence is not
producible in this environment.  The measured overlap evidence is the
uncontended wall-clock A/B (multihost_overlap.json); this script is
kept as the probe that established the limitation.

Compiles the sharded train step on the 8-device CPU mesh with overlap
on and off, and inspects the OPTIMIZED HLO for (a) async collective
start/done pairs and (b) how many real compute ops (dots/fusions) the
scheduler placed BETWEEN each all-gather-start and its -done — the
direct compiled-schedule counterpart of the wall-clock A/B in
multihost_overlap.json.

Writes artifacts/perf/hlo_overlap_schedule.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def analyze(overlap: bool) -> dict:
    graph = make_polypharmacy_like_graph(
        n_proteins=600, n_drugs=200, n_side_effects=12, seed=7,
        planted_rank=8,
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.0, seed=8)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("row", "edge"))
    sg = build_sharded_device_graph(graph, splits, mesh)
    model = DecagonModel(ModelConfig(hidden1=32, hidden2=16), sg)
    cfg = TrainConfig(batch_size=128, comm_overlap=overlap)
    opt = make_optimizer(cfg)
    params = model.init_params(jax.random.PRNGKey(0), sg)
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
    rows = jnp.zeros((128,), jnp.int32)
    compiled = step.lower(
        params, opt_state, sg, jnp.int32(0), rows, rows,
        jax.random.PRNGKey(0), jnp.int32(0),
    ).compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    # entry computation schedule: walk it linearly; async pairs appear
    # as <op>-start ... <op>-done with the scheduled ops between them.
    starts = {}
    spans = []
    compute_re = re.compile(r"= .*(fusion|dot|convolution)\(")
    pending = {}
    for idx, ln in enumerate(lines):
        m = re.search(r"%?([\w.-]+) = .*(all-gather|all-reduce|"
                      r"collective-permute|reduce-scatter)-start", ln)
        if m:
            pending[m.group(1)] = [idx, m.group(2), 0]
            continue
        m2 = re.search(r"-done\(((?:%|)([\w.-]+))", ln)
        if m2:
            name = m2.group(2)
            # -done ops reference the start op name
            for key in list(pending):
                if key in ln:
                    start_idx, kind, nc = pending.pop(key)
                    spans.append(
                        {"kind": kind, "ops_between": nc,
                         "span_lines": idx - start_idx}
                    )
                    break
            continue
        if compute_re.search(ln):
            for key in pending:
                pending[key][2] += 1

    n_async = len(spans)
    overlapped = [s for s in spans if s["ops_between"] > 0]
    return {
        "async_collective_pairs": n_async,
        "pairs_with_compute_between": len(overlapped),
        "total_compute_ops_inside_spans": sum(
            s["ops_between"] for s in spans
        ),
        "by_kind": {
            k: sum(1 for s in spans if s["kind"] == k)
            for k in {s["kind"] for s in spans}
        },
        "hlo_total_lines": len(lines),
    }


def main():
    out = {
        "config": "600 prot / 200 drugs / 12 rels, (4,2) CPU mesh, "
                  "weight-sharded step",
        "overlap_on": analyze(True),
        "overlap_off": analyze(False),
        "note": (
            "FINDING: both variants report ZERO async pairs because "
            "XLA:CPU lowers every collective synchronously (and "
            "multi-chip TPU programs cannot compile through the "
            "single-chip tunnel) — compiled-schedule async evidence is "
            "not producible in this environment.  The CPU runtime's "
            "thunk-level threading is what the UNCONTENDED wall-clock "
            "A/B measures instead: the two-phase schedule hides 9.9% "
            "of step wall = 31.5% of exposed communication "
            "(multihost_overlap.json).  On a real TPU slice the same "
            "dependency structure is the enabling condition for XLA's "
            "async-collective scheduler."
        ),
    }
    path = os.path.join(ROOT, "artifacts", "perf",
                        "hlo_overlap_schedule.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
