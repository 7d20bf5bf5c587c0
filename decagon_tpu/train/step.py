"""Jitted train / eval step builders.

One compiled step per *edge type* (4 variants for the canonical graph):
the edge type — and with it every array shape, the decoder kind, and the
embedding tables touched — is static, while the within-type relation
index ``k`` and the edge batch are traced values.  This is the TPU-native
counterpart of the reference's single dynamic graph fed one
(edge-type, relation, batch) triple per ``session.run``
(``main/Trainer/DecagonTrainer.py:90-102``, ``optimizer.py:29-61``).

Each step: full-graph encoder forward (with dropout), positive scores on
the batch edges, ``batch_size`` negative row samples from the relation's
unigram^0.75 CDF, hinge/xent loss, Adam update.  Divergence note: the
reference's TF1 Adam applies sparse (lazy) moment updates to decoder rows
touched by ``tf.gather``; optax Adam is dense, so inactive relations'
moments decay each step.  Same fixed points, slightly different momentum
tails; encoder weights (the bulk) participate every step either way.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from decagon_tpu.graph.device import DeviceGraph, EdgeType, etkey
from decagon_tpu.models.losses import LOSSES
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.train.negatives import sample_unigram


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference ``configuration.json``)."""

    batch_size: int = 512
    learning_rate: float = 1e-3
    loss: str = "hinge"
    margin: float = 0.1
    neg_sample_weight: float = 1.0
    num_epochs: int = 50


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # TF1 AdamOptimizer defaults: b1=0.9, b2=0.999, eps=1e-8
    # (reference optimizer.py:111-114).
    return optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def make_train_step(
    model: DecagonModel,
    edge_type: EdgeType,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Returns jitted ``step(params, opt_state, graph, k, rows, cols, rng)
    -> (params, opt_state, loss)`` for one static edge type."""
    loss_name = cfg.loss
    et_key = etkey(edge_type)
    row_type = str(edge_type[0])

    def loss_fn(params, graph: DeviceGraph, k, rows, cols, rng):
        enc_rng, sample_rng = jax.random.split(rng)
        embeddings = model.embeddings(
            params, graph, enc_rng, deterministic=False
        )
        # Scoring is deterministic given the embeddings: the reference
        # train path applies dropout only inside the encoder
        # (optimizer.py:63-85 has no dropout).
        pos = model.score_edges(
            params, graph, embeddings, edge_type, k, rows, cols
        )
        neg_rows = sample_unigram(
            sample_rng, graph.neg_cdf[et_key][k], cfg.batch_size
        )
        neg = model.score_edges(
            params, graph, embeddings, edge_type, k, neg_rows, cols
        )
        if loss_name == "hinge":
            return LOSSES["hinge"](pos, neg, cfg.margin)
        return LOSSES["xent"](pos, neg, cfg.neg_sample_weight)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph, k, rows, cols, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, graph, k, rows, cols, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_train_steps(
    model: DecagonModel, graph: DeviceGraph, cfg: TrainConfig
) -> Tuple[Dict[EdgeType, Callable], optax.GradientTransformation]:
    optimizer = make_optimizer(cfg)
    steps = {
        et: make_train_step(model, et, cfg, optimizer)
        for et in graph.edge_types
    }
    return steps, optimizer


def make_eval_scores(
    model: DecagonModel, edge_type: EdgeType
) -> Callable:
    """Jitted deterministic edge scorer for one edge type.

    ``scores(params, graph, k, rows, cols) -> sigmoid probabilities`` —
    feed padded fixed-size index arrays and trim host-side (eval-set
    sizes vary per relation; padding keeps compilation static).
    """

    @jax.jit
    def scores(params, graph: DeviceGraph, k, rows, cols):
        embeddings = model.embeddings(params, graph, deterministic=True)
        logits = model.score_edges(
            params, graph, embeddings, edge_type, k, rows, cols,
            deterministic=True,
        )
        return jax.nn.sigmoid(logits)

    return scores
