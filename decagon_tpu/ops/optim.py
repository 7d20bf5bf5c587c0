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
