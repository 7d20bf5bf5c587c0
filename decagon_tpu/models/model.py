"""DecagonModel: parameter construction + functional application.

Facade tying the encoder (``decagon_tpu.models.encoder``) to per-edge-type
decoders (``decagon_tpu.models.decoders``), the functional counterpart of
the reference's graph-building ``DecagonModel`` (``decagon/deep/model.py:
47-137``).  Everything is a pure function of an explicit params pytree —
no global state, no flags (the reference's ``tf.app.flags`` coupling is a
documented wart, SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from decagon_tpu.graph.device import DeviceGraph, EdgeType, etkey
from decagon_tpu.models import decoders as dec
from decagon_tpu.models.encoder import encode, init_encoder_params
from decagon_tpu.ops.segment import dropout

Params = Dict[str, Dict]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference defaults: ``configuration.json`` /
    ``main.py:229-238`` — hidden 64->32, dropout 0.1)."""

    hidden1: int = 64
    hidden2: int = 32
    dropout: float = 0.1
    per_relation_dropout_max: int = 64
    # "auto" resolves per edge type: dense MXU matmul where the device
    # graph carries a dense stack, the Pallas tiled kernel where it
    # carries tilings (accelerator backends), XLA segment-sum otherwise.
    spmm_impl: str = "auto"
    # MXU pass precision for the Pallas kernel: "highest" (fp32
    # decomposition) or "default" (single-pass bf16, ~2x faster,
    # fp32 accumulation).
    spmm_precision: str = "highest"
    # Eval-scale decoder scoring: "auto" (the Pallas one-hot-matmul
    # kernel on TPU where the tables fit VMEM, XLA gather + einsum
    # elsewhere), "jnp" (force the XLA path), "pallas" (force the
    # compiled kernel — raises off-TPU instead of silently running
    # interpret mode), "pallas_interpret" (interpret-mode verification,
    # any backend — orders of magnitude slower; tests only).
    sddmm_impl: str = "auto"
    # MXU precision for the Pallas SDDMM: "highest" (exact fp32 — the
    # one-hot gathers are lossless) or "default" (bf16 single-pass,
    # ~6x less MXU work, ~1e-2 relative score error).
    sddmm_precision: str = "highest"
    # Rematerialize the encoder in the backward pass (jax.checkpoint):
    # drops the [K, N, H] projected-stack residuals — the largest
    # training-time liveness at big graph sizes — for ~1 extra forward.
    # Extends the trainable-size envelope (see sparse_regime_bench).
    remat: bool = False


class DecagonModel:
    """Stateless model: holds config + static graph metadata only."""

    def __init__(self, config: ModelConfig, graph: DeviceGraph):
        self.config = config
        self.graph_meta = graph  # static metadata source (shapes, decoders)

    # ---- params --------------------------------------------------------

    def init_params(self, rng: jax.Array, graph: DeviceGraph) -> Params:
        enc_rng, dec_rng = jax.random.split(rng)
        params = init_encoder_params(
            enc_rng, graph, self.config.hidden1, self.config.hidden2,
            spmm_impl=self.config.spmm_impl,
        )
        dec_params: Dict[str, Dict[str, jax.Array]] = {}
        for et in graph.edge_types:
            key = etkey(et)
            dec_rng, sub = jax.random.split(dec_rng)
            dec_params[key] = dec.init_decoder_params(
                sub,
                graph.decoder_name(et),
                graph.num_relations(et),
                self.config.hidden2,
            )
        params["dec"] = dec_params
        return params

    # ---- forward -------------------------------------------------------

    def embeddings(
        self,
        params: Params,
        graph: DeviceGraph,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        axis_name: Optional[str] = None,
    ) -> Dict[str, jax.Array]:
        def _encode(params, graph, rng):
            return encode(
                params,
                graph,
                rng,
                dropout_rate=self.config.dropout,
                deterministic=deterministic,
                spmm_impl=self.config.spmm_impl,
                per_relation_dropout_max=self.config.per_relation_dropout_max,
                axis_name=axis_name,
                spmm_precision=self.config.spmm_precision,
            )

        if getattr(self.config, "remat", False) and not deterministic:
            # Rematerialize the encoder in the backward pass: residuals
            # (the per-relation projected stacks — [K, N_j, H] at every
            # layer) are the largest training-time liveness at big graph
            # sizes, and dropping them trades ~1 extra forward for the
            # headroom that makes beyond-HBM configs trainable (e.g.
            # the 2500-drug sparse-regime config misses by ~0.5 GB
            # without this — sparse_regime_bench.json).
            return jax.checkpoint(_encode)(params, graph, rng)
        return _encode(params, graph, rng)

    def score_edges(
        self,
        params: Params,
        graph: DeviceGraph,
        embeddings: Dict[str, jax.Array],
        edge_type: EdgeType,
        k: jax.Array,
        rows: jax.Array,
        cols: jax.Array,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Logit scores for B (row, col) pairs of relation ``k`` of
        ``edge_type``.

        Note: the reference's TRAINING path scores through
        ``DecagonOptimizer.batch_predict`` (``optimizer.py:63-85``), which
        applies NO dropout to the gathered embeddings — the decoder
        layers' dropout (``layers.py:139-140``) is dead code there (their
        ``_call`` is never invoked; only their variables feed
        ``latent_inters``/``latent_varies``).  Decoder-input dropout is
        therefore opt-in here (pass ``deterministic=False`` + ``rng``)
        and NOT used by the stock train step."""
        name = graph.decoder_name(edge_type)
        z_rows = embeddings[str(edge_type[0])][rows]
        z_cols = embeddings[str(edge_type[1])][cols]
        if not deterministic and rng is not None:
            r1, r2 = jax.random.split(rng)
            z_rows = dropout(r1, z_rows, self.config.dropout)
            z_cols = dropout(r2, z_cols, self.config.dropout)
        return dec.score_edges(
            params["dec"][etkey(edge_type)], name, k, z_rows, z_cols
        )

    def score_matrix(
        self,
        params: Params,
        graph: DeviceGraph,
        embeddings: Dict[str, jax.Array],
        edge_type: EdgeType,
        k: jax.Array,
    ) -> jax.Array:
        """Dense logit matrix for one relation (predictor / parity only)."""
        name = graph.decoder_name(edge_type)
        return dec.score_matrix(
            params["dec"][etkey(edge_type)],
            name,
            k,
            embeddings[str(edge_type[0])],
            embeddings[str(edge_type[1])],
        )
