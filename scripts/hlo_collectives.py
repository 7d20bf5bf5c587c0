"""Collective inventory from compiled HLO vs the analytic scaling model
(VERDICT r3 item 6: "count/size collectives from compiled HLO, and
validate the model's per-mesh predictions").

Real multi-chip hardware is unavailable here, but XLA's partitioner runs
identically on the 8-virtual-device CPU mesh — the collectives it emits
for the sharded train step ARE the collectives a pod slice would run.
This script compiles ``make_sharded_train_step`` for several mesh shapes
at mid scale (poly50: 2000 proteins / 400 drugs / 50 relations), walks
the optimized HLO for all-reduce / all-gather / reduce-scatter /
all-to-all / collective-permute ops, sums their tensor bytes, derives
per-device ring wire bytes, and compares against the same formulas
``scripts/scaling_model.py`` uses (applied to the poly50 shapes).

Writes artifacts/perf/hlo_collectives.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_polypharmacy_like_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.parallel.mesh import make_mesh
from decagon_tpu.parallel.rowshard import build_sharded_device_graph
from decagon_tpu.parallel.sharded import (
    make_sharded_train_step,
    shardable_weight_keys,
)
from decagon_tpu.train.step import TrainConfig, make_optimizer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "pred": 1, "s8": 1, "u8": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "all-to-all", "collective-permute")

# `%op.1 = (f32[2000,64]{1,0}, ...) all-reduce(` or scalar `f32[]`.
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def _op_bytes(defn: str) -> int:
    """Total tensor bytes in the op's (possibly tuple) result shape."""
    lhs = defn.split(" = ", 1)[1]
    # Result shape(s) precede the op name token.
    for coll in _COLLECTIVES:
        cut = lhs.find(coll + "(")
        if cut >= 0:
            lhs = lhs[:cut]
            break
    total = 0
    for dtype, dims in _SHAPE_RE.findall(lhs):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def inventory(hlo_text: str) -> dict:
    out = {c: {"count": 0, "tensor_bytes": 0} for c in _COLLECTIVES}
    for line in hlo_text.splitlines():
        line = line.strip()
        if " = " not in line:
            continue
        for coll in _COLLECTIVES:
            # Match the op name token, not fused-computation mentions.
            if re.search(rf"\)?\s{coll}\(", line) or re.search(
                rf"\s{coll}-start\(", line
            ):
                out[coll]["count"] += 1
                out[coll]["tensor_bytes"] += _op_bytes(line)
                break
    return {k: v for k, v in out.items() if v["count"]}


# ---- the scaling model's formulas, at poly50 shapes ------------------

def ring_allreduce_wire(size_bytes: float, n: int) -> float:
    return 0.0 if n <= 1 else 2.0 * size_bytes * (n - 1) / n


def ring_allgather_wire(shard_bytes: float, n: int) -> float:
    return 0.0 if n <= 1 else shard_bytes * (n - 1)


def model_prediction(nr, ne, n_prot, n_drug, h1, h2,
                     enc_param_bytes, dec_param_bytes) -> dict:
    act_edge = act_row = 0.0
    for h in (h1, h2):
        for n_nodes in (n_prot, n_drug):
            nb = -(-n_nodes // nr)
            blk = nb * h * 4
            act_edge += ring_allreduce_wire(blk, ne)
            act_row += ring_allgather_wire(blk, nr)
    # fwd + mirrored bwd (gather_rows backward = row reduce-scatter +
    # edge psum of the scattered block — same wire volume as the fwd
    # all_gather + psum; see parallel/collectives.py).
    act_edge *= 2
    act_row *= 2
    grad_row = ring_allreduce_wire(enc_param_bytes / ne, nr)
    grad_mesh = ring_allreduce_wire(dec_param_bytes, nr * ne)
    return {
        "act_edge_mib": round(act_edge / 2**20, 3),
        "act_row_mib": round(act_row / 2**20, 3),
        "grad_row_mib": round(grad_row / 2**20, 3),
        "grad_mesh_mib": round(grad_mesh / 2**20, 3),
        "total_mib": round(
            (act_edge + act_row + grad_row + grad_mesh) / 2**20, 3
        ),
    }


def main():
    graph = make_polypharmacy_like_graph(
        n_proteins=2000, n_drugs=400, n_side_effects=50, seed=7,
        planted_rank=16,
    )
    splits = split_graph(graph, val_frac=0.05, test_frac=0.05, seed=8)
    model = None
    cfg = TrainConfig(batch_size=512, learning_rate=1e-3)
    out = {"workload": "poly50 (2000 prot / 400 drug / 50 rel x2)",
           "meshes": {}}
    for shape in [(1, 8), (2, 4), (4, 2)]:
        mesh = make_mesh(shape=shape)
        sg = build_sharded_device_graph(graph, splits, mesh)
        if model is None:
            model = DecagonModel(
                ModelConfig(hidden1=64, hidden2=32, dropout=0.1), sg
            )
            params = model.init_params(jax.random.PRNGKey(0), sg)
            opt = make_optimizer(cfg)
            opt_state = opt.init(params)
            enc_b = sum(
                int(np.prod(params[lvl][k].shape)) * 4
                for lvl in ("enc1", "enc2") for k in params[lvl]
            )
            dec_b = sum(
                int(np.prod(leaf.shape)) * 4
                for et in params["dec"].values() for leaf in et.values()
            )
        from decagon_tpu.parallel.sharded import pad_relation_stacks

        step = make_sharded_train_step(
            model, (1, 1), cfg, opt, mesh, sg, shard_weights=True,
        )
        p_pad = pad_relation_stacks(params, sg)
        o_pad = {
            "m": pad_relation_stacks(opt_state["m"], sg),
            "v": pad_relation_stacks(opt_state["v"], sg),
            "t": opt_state["t"],
        }
        rows = jnp.zeros(512, jnp.int32)
        cols = jnp.zeros(512, jnp.int32)
        lowered = step.lower(
            p_pad, o_pad, sg, jnp.int32(0), rows, cols,
            jax.random.PRNGKey(0), jnp.int32(0),
        )
        hlo = lowered.compile().as_text()
        inv = inventory(hlo)
        key = f"{shape[0]}x{shape[1]}"
        out["meshes"][key] = {
            "hlo_collectives": inv,
            "hlo_total_tensor_mib": round(
                sum(v["tensor_bytes"] for v in inv.values()) / 2**20, 3
            ),
            "model_wire_prediction": model_prediction(
                shape[0], shape[1], 2000, 400, 64, 32, enc_b, dec_b
            ),
        }
        print(f"[{key}] {json.dumps(out['meshes'][key])}", flush=True)

    path = os.path.join(ROOT, "artifacts", "perf", "hlo_collectives.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
