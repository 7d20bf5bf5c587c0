"""Fused per-leaf Adam (HBM-minimal optimizer update).

At full polypharmacy scale the parameter pytree is dominated by the
drug-drug per-relation weight stacks (~hundreds of MiB whose TPU
physical layout pads the 64/32-wide minor dims to 128 lanes).  The
round-2 optimizer — ``optax.flatten(optax.adam)`` — ravels every leaf
into one vector each step; on TPU that ravel is a physical RELAYOUT
(gather) of the padded stacks, not a free view, and it put the Adam
update at ~20 ms of the 39 ms full-scale step (artifacts/perf/
adam_probe.json).

``fused_adam`` keeps each leaf in its natural layout and expresses the
whole update as ONE elementwise chain per leaf — m/v decay, bias-
corrected step, and the parameter delta — so XLA fuses it into a single
read-modify-write pass over (g, m, v): the HBM-roofline formulation of
a dense Adam step.  Math is exactly ``optax.adam`` (same bias
correction, eps placement; TF1 AdamOptimizer defaults b1=0.9 b2=0.999
eps=1e-8 — reference ``decagon/deep/optimizer.py:111-114``), verified
bit-close in tests/test_optim.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def fused_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Drop-in ``optax.adam`` with per-leaf single-pass updates."""

    def init(params):
        return {
            "m": jax.tree_util.tree_map(jnp.zeros_like, params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        del params  # update is independent of current params
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        # optax.adam's bias correction folded into scalar multipliers:
        #   upd = -lr * (m/(1-b1^t)) / (sqrt(v/(1-b2^t)) + eps)
        s1 = 1.0 / (1.0 - jnp.power(b1, tf))
        s2 = 1.0 / (1.0 - jnp.power(b2, tf))

        def one(g, m, v):
            m_new = b1 * m + (1.0 - b1) * g
            v_new = b2 * v + (1.0 - b2) * (g * g)
            upd = (-learning_rate) * (s1 * m_new) / (
                jnp.sqrt(s2 * v_new) + eps
            )
            return upd, m_new, v_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        outs = [
            one(g, m, v)
            for g, m, v in zip(
                flat_g,
                treedef.flatten_up_to(state["m"]),
                treedef.flatten_up_to(state["v"]),
            )
        ]
        updates = treedef.unflatten([o[0] for o in outs])
        return updates, {
            "m": treedef.unflatten([o[1] for o in outs]),
            "v": treedef.unflatten([o[2] for o in outs]),
            "t": t,
        }

    return optax.GradientTransformation(init, update)


# ---- Pallas fully-fused update (single read-modify-write pass) -------
#
# XLA fuses the elementwise chain above well, but the parameter add
# still flows through optax.apply_updates — a separate pass over the
# update tensor (read g,m,v + write m,v,upd, then read p,upd + write p:
# 9 HBM passes/leaf).  The Pallas kernel below computes m', v', AND p'
# in ONE kernel (read g,m,v,p + write m,v,p: 7 passes — the HBM floor
# for dense f32 Adam), with the big leaves tiled over a flat grid.
# Exposed via ``fused_adam_apply`` (TrainConfig.pallas_adam, default
# OFF): measured at paper scale the kernel currently LOSES to the XLA
# chain — its flatten+pad prep physically relayouts the padded weight
# stacks each step (64.7 vs 34.2 ms raw-update microbench on v5e), the
# same trap as round 2's optax.flatten.  A natural-shape per-leaf-block
# variant (no reshape) is the path to the 7-pass floor.

from functools import partial as _partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ADAM_BLOCK_ROWS = 1024


def _adam_kernel(s_ref, g_ref, m_ref, v_ref, p_ref,
                 mo_ref, vo_ref, po_ref, *, lr, b1, b2, eps):
    s1 = s_ref[0, 0]
    s2 = s_ref[0, 1]
    g = g_ref[:]
    m_new = b1 * m_ref[:] + (1.0 - b1) * g
    v_new = b2 * v_ref[:] + (1.0 - b2) * (g * g)
    upd = (-lr) * (s1 * m_new) / (jnp.sqrt(s2 * v_new) + eps)
    mo_ref[:] = m_new
    vo_ref[:] = v_new
    po_ref[:] = p_ref[:] + upd


def _adam_leaf(g, m, v, p, scalars, lr, b1, b2, eps, interpret=False):
    """One fused Adam pass over a leaf of any shape (flattened+tiled)."""
    shape = g.shape
    n = g.size
    rows = -(-n // _LANES)
    rows_pad = -(-rows // _ADAM_BLOCK_ROWS) * _ADAM_BLOCK_ROWS
    pad = rows_pad * _LANES - n

    def prep(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows_pad, _LANES)

    grid = rows_pad // _ADAM_BLOCK_ROWS
    spec = pl.BlockSpec(
        (_ADAM_BLOCK_ROWS, _LANES), lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows_pad, _LANES), jnp.float32)
            for _ in range(3)
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, prep(g), prep(m), prep(v), prep(p))
    m2, v2, p2 = (x.reshape(-1)[:n].reshape(shape) for x in out)
    return m2, v2, p2


def fused_adam_apply(
    grads, state, params,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    min_pallas_size: int = 1 << 20,
):
    """(params', state') in one fused HBM pass per leaf.

    Same math (and the same ``{"m","v","t"}`` state layout) as
    ``fused_adam``; leaves below ``min_pallas_size`` elements take the
    XLA elementwise chain (kernel-launch overhead beats HBM savings for
    KB-sized decoder leaves)."""
    t = state["t"] + 1
    tf = t.astype(jnp.float32)
    s1 = 1.0 / (1.0 - jnp.power(b1, tf))
    s2 = 1.0 / (1.0 - jnp.power(b2, tf))
    scalars = jnp.stack([s1, s2]).reshape(1, 2)

    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    flat_p = treedef.flatten_up_to(params)
    new_m, new_v, new_p = [], [], []
    for g, m, v, p in zip(flat_g, flat_m, flat_v, flat_p):
        if g.size >= min_pallas_size and g.dtype == jnp.float32:
            m2, v2, p2 = _adam_leaf(
                g, m, v, p, scalars, learning_rate, b1, b2, eps,
                interpret=interpret,
            )
        else:
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * (g * g)
            p2 = p + (-learning_rate) * (s1 * m2) / (
                jnp.sqrt(s2 * v2) + eps
            )
        new_m.append(m2)
        new_v.append(v2)
        new_p.append(p2)
    return treedef.unflatten(new_p), {
        "m": treedef.unflatten(new_m),
        "v": treedef.unflatten(new_v),
        "t": t,
    }
