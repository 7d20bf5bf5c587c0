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
    moments_dtype=None,
    schedule=None,
) -> optax.GradientTransformation:
    """Drop-in ``optax.adam`` with per-leaf single-pass updates.

    ``moments_dtype=jnp.bfloat16`` stores m/v at half width — at paper
    scale the optimizer pass is HBM-bound on the m/v/p traffic, so this
    trims ~4/14 of its bytes; the decay/bias-correction arithmetic
    still runs in fp32 (quality validated on the mid-scale config:
    artifacts/quality/adam_bf16_moments.json).

    ``schedule``: optional ``fn(t: int32 scalar) -> f32 scalar``
    mapping the optimization-step count to the learning rate (cosine /
    step decay; ``train.step._lr_schedule_fn``).  The scalar is traced,
    so scheduling costs nothing per step."""

    def init(params):
        def zeros(p):
            dt = moments_dtype or p.dtype
            return jnp.zeros(p.shape, dt)

        return {
            "m": jax.tree_util.tree_map(zeros, params),
            "v": jax.tree_util.tree_map(zeros, params),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        del params  # update is independent of current params
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        lr = learning_rate if schedule is None else schedule(t)
        # optax.adam's bias correction folded into scalar multipliers:
        #   upd = -lr * (m/(1-b1^t)) / (sqrt(v/(1-b2^t)) + eps)
        s1 = 1.0 / (1.0 - jnp.power(b1, tf))
        s2 = 1.0 / (1.0 - jnp.power(b2, tf))

        def one(g, m, v):
            store = m.dtype
            g = g.astype(jnp.float32)  # bf16 grads: arithmetic in fp32
            m_new = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v_new = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
            upd = (-lr) * (s1 * m_new) / (
                jnp.sqrt(s2 * v_new) + eps
            )
            m_new = m_new.astype(store)
            v_new = v_new.astype(store)
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
# OFF).  Measured on v5e at paper-scale leaf shapes, BOTH kernel
# variants lose to the XLA chain: the original flatten+pad prep
# relayouted the padded stacks each step (64.7 vs 34.2 ms raw-update
# microbench — round 2's optax.flatten trap), and the natural-shape
# 3D-block rewrite below still runs 47.7 vs 30.4 ms — ~1900 small
# grid steps of per-step fixed cost swamp the saved pass.  The honest
# accounting: the [K, 645, 64] stacks' PHYSICAL layout pads 64 -> 128
# lanes, so every elementwise pass moves ~2x the logical bytes and the
# true HBM floor for this update is ~5.5 ms — which the fused XLA
# chain's measured 6.5 ms in the real step (fullscale_step_profile.
# json) already approaches at ~85%.  The kernel stays as an opt-in
# record of the negative result.

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
    """One fused Adam pass over a 3D leaf IN ITS NATURAL SHAPE.

    No reshape/flatten: a reshape of a padded-interior TPU array is a
    physical relayout (the original flattened variant of this kernel
    LOST 30 ms/step to exactly that — the round-2 optax.flatten trap).
    The grid tiles the two leading dims; the trailing dim rides whole
    (its lane padding is the array's own physical layout, so DMA
    matches storage)."""
    d0, d1, h = g.shape
    # VMEM accounting uses PHYSICAL bytes: the trailing dim pads to 128
    # lanes, d1 to 8 sublanes, and the pipeline double-buffers every
    # operand (7 live refs + 1 scalar) — so the per-block budget is a
    # small fraction of the ~16 MB VMEM.
    h_pad = -(-h // 128) * 128
    row_bytes = (-(-d1 // 8) * 8) * h_pad * 4
    budget = 384 * 1024  # x7 operands x2 pipeline ~ 5.3 MB
    if row_bytes <= budget:
        blk1 = d1
        blk0 = max(1, budget // max(row_bytes, 1))
    else:
        blk1 = max(8, (budget // (h_pad * 4)) // 8 * 8)
        blk0 = 1
    blk0 = min(blk0, d0)
    grid = (-(-d0 // blk0), -(-d1 // blk1))
    spec = pl.BlockSpec(
        (blk0, blk1, h), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((d0, d1, h), jnp.float32)
            for _ in range(3)
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, g, m, v, p)
    return out


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
        if (
            g.ndim == 3
            and g.size >= min_pallas_size
            and g.dtype == jnp.float32
            and m.dtype == jnp.float32  # bf16 moments: XLA chain only
        ):
            m2, v2, p2 = _adam_leaf(
                g, m, v, p, scalars, learning_rate, b1, b2, eps,
                interpret=interpret,
            )
        else:
            # Mirror fused_adam's arithmetic exactly: decay in fp32 and
            # cast m/v back to their STORAGE dtype — with bf16 moments the
            # raw chain would silently promote the carried moments to f32
            # (dtype-changing scan carries / doubled moment memory) and
            # run the decay multiply in bf16 (ADVICE r4, medium).
            store = m.dtype
            g = g.astype(jnp.float32)
            m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
            p2 = p + (-learning_rate) * (s1 * m2) / (
                jnp.sqrt(s2 * v2) + eps
            )
            m2 = m2.astype(store)
            v2 = v2.astype(store)
        new_m.append(m2)
        new_v.append(v2)
        new_p.append(p2)
    return treedef.unflatten(new_p), {
        "m": treedef.unflatten(new_m),
        "v": treedef.unflatten(new_v),
        "t": t,
    }
