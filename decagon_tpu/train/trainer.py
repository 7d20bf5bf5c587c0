"""Training driver: epoch loop over the minibatch scheduler.

Capability spec: reference ``BaseDecagonTrainer``
(``main/Trainer/DecagonTrainer.py:44-102``) — per epoch: shuffle, iterate
minibatches, one optimization step per (relation, batch), periodic
logging/eval/checkpoint hooks, epoch-end evaluation.  Here each step
dispatches to the pre-compiled per-edge-type jitted step; the graph stays
device-resident (no per-step feed of adjacencies).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from decagon_tpu.graph.container import RelationGraph, RelationKey
from decagon_tpu.graph.device import DeviceGraph
from decagon_tpu.graph.split import EdgeSplit
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.train.sampler import Minibatch, MinibatchScheduler
from decagon_tpu.train.step import TrainConfig, make_train_steps


@dataclasses.dataclass
class IterationResult:
    """Per-iteration record (reference
    ``Dtos/Decagon/DecagonTrainingIterationResults.py:3-12``)."""

    epoch: int
    iteration: int
    loss: float
    latency: float
    edge_type: RelationKey


class Trainer:
    def __init__(
        self,
        model: DecagonModel,
        graph: RelationGraph,
        splits: Dict[RelationKey, EdgeSplit],
        device_graph: DeviceGraph,
        config: TrainConfig,
        seed: int = 0,
        iteration_hook: Optional[Callable[["Trainer", IterationResult], None]] = None,
        epoch_hook: Optional[Callable[["Trainer", int], None]] = None,
        mesh=None,
        init_state: Optional[Dict] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with (row, edge) axes
        (``parallel.make_mesh``) — the trainer partitions the adjacency
        over it (destination-row blocks x edge shards, dense relation
        stacks split over relations; ``parallel.rowshard``) and runs the
        sharded ``shard_map`` step; parameters stay replicated.  With
        ``config.scan_chunk > 0`` the mesh path runs the scanned-chunk
        sharded step (one dispatch per chunk).  ``device_graph`` may
        be a prebuilt ``ShardedGraph`` matching the mesh, or a plain
        ``DeviceGraph`` (then the sharded graph is built from
        ``graph``/``splits``)."""
        self.model = model
        self.graph = graph
        self.splits = splits
        self.config = config
        self.mesh = mesh
        self.scheduler = MinibatchScheduler(
            graph, splits, batch_size=config.batch_size, seed=seed,
            schedule=getattr(config, "schedule", "reference"),
        )
        self.group = max(1, getattr(config, "relation_group", 1))
        if self.group > 1 and config.scan_chunk <= 0:
            raise ValueError("relation_group > 1 requires scan_chunk > 0")
        if mesh is not None:
            from decagon_tpu.parallel.rowshard import (
                ShardedGraph,
                build_sharded_device_graph,
            )
            from decagon_tpu.parallel.sharded import (
                make_sharded_embed_fn,
                make_sharded_train_step,
                shardable_weight_keys,
            )
            from decagon_tpu.train.step import make_optimizer

            if isinstance(device_graph, ShardedGraph):
                self.device_graph = device_graph
            else:
                self.device_graph = build_sharded_device_graph(
                    graph, splits, mesh
                )
            # Weight sharding needs encode_sharded's dense relation-block
            # path: a non-dense spmm_impl would raise at trace time
            # inside the sharded step, so auto-disable with the other
            # gates (ADVICE r3).
            dense_spmm = getattr(model.config, "spmm_impl", "auto") in (
                "auto", "dense",
            )
            self.shard_weights = bool(
                config.shard_weights
                and not config.lazy_decoder_adam
                and dense_spmm
                and shardable_weight_keys(self.device_graph)
            )
            self.optimizer = make_optimizer(config)
            self.steps = {
                et: make_sharded_train_step(
                    model, et, config, self.optimizer, mesh,
                    self.device_graph,
                    shard_weights=self.shard_weights,
                )
                for et in self.device_graph.edge_types
            }
            self.embed_fn = make_sharded_embed_fn(
                model, mesh, self.device_graph,
                shard_weights=self.shard_weights,
            )
        else:
            self.device_graph = device_graph
            self.shard_weights = False
            self.steps, self.optimizer = make_train_steps(
                model, device_graph, config
            )
            self.embed_fn = None
        init_rng, self.step_rng = jax.random.split(jax.random.PRNGKey(seed))
        if init_state is not None:
            # Reuse an existing (params, opt_state, step) — e.g. resuming
            # into a trainer with a different spmm impl, or benchmarking
            # several variants without paying init twice.
            self.params = init_state["params"]
            self.opt_state = init_state["opt_state"]
            self.global_step = int(init_state.get("global_step", 0))
            self.opt_step = int(
                init_state.get("opt_step", self.global_step // self.group)
            )
        else:
            # ONE compiled dispatch for the whole init: eager per-tensor
            # glorot draws would cost a compile round-trip each on
            # remote-attached TPUs (~10s apiece at 963-relation scale).
            @jax.jit
            def _init(rng):
                params = model.init_params(rng, self.device_graph)
                return params, self.optimizer.init(params)

            self.params, self.opt_state = _init(init_rng)
            self.global_step = 0
            # Optimization-step counter, distinct from the batch counter:
            # grouped mode consumes one RNG step_no per SLOT (G batches),
            # so deriving it as global_step // G would repeat a step_no —
            # and with it the dropout mask and negative draws — whenever
            # an epoch's batch count is not a multiple of G (ADVICE r4).
            self.opt_step = 0
        if mesh is not None:
            # Commit state to the mesh up front: the sharded step's
            # outputs carry NamedShardings, so without this the second
            # call of every edge type's step recompiles for the new
            # input shardings.
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())
            if self.shard_weights:
                from decagon_tpu.parallel.sharded import (
                    pad_relation_stacks,
                    shard_state_tree,
                )

                self.params = shard_state_tree(
                    pad_relation_stacks(self.params, self.device_graph),
                    self.device_graph, mesh,
                )
                if not (
                    isinstance(self.opt_state, dict)
                    and {"m", "v", "t"} <= set(self.opt_state)
                ):
                    raise ValueError(
                        "shard_weights expects the fused_adam state "
                        "({'m','v','t'}); pass config.shard_weights="
                        "False for other optimizer states"
                    )
                self.opt_state = shard_state_tree(
                    {
                        "m": pad_relation_stacks(
                            self.opt_state["m"], self.device_graph
                        ),
                        "v": pad_relation_stacks(
                            self.opt_state["v"], self.device_graph
                        ),
                        "t": self.opt_state["t"],
                    },
                    self.device_graph, mesh,
                )
            else:
                self.params = jax.device_put(self.params, repl)
                self.opt_state = jax.device_put(self.opt_state, repl)
            self.step_rng = jax.device_put(self.step_rng, repl)
        self.iteration_hook = iteration_hook
        self.epoch_hook = epoch_hook
        self._chunk_fn = None
        self._branch_idx = {
            et: i for i, et in enumerate(device_graph.edge_types)
        }

    def eval_embeddings(self) -> Dict[str, jax.Array]:
        """Deterministic full-graph node tables for eval/export — via the
        sharded forward when training on a mesh."""
        if self.embed_fn is not None:
            return self.embed_fn(self.params, self.device_graph)
        return self.model.embeddings(
            self.params, self.device_graph, deterministic=True
        )

    # ---- checkpoint state ---------------------------------------------

    def state_dict(self) -> Dict:
        """Checkpointable training state (params + optimizer + step).

        Topology-independent: with ``shard_weights`` the live state holds
        relation stacks padded to ``k_loc * n_edge_shards`` and sharded
        over the edge axis — here they are UNPADDED back to ``num_rel``
        so checkpoints restore into any mesh shape (or the single-chip
        trainer); ``load_state_dict`` re-pads and re-shards."""
        params, opt_state = self.params, self.opt_state
        if self.shard_weights:
            from decagon_tpu.parallel.sharded import unpad_relation_stacks

            params = unpad_relation_stacks(params, self.device_graph)
            opt_state = {
                "m": unpad_relation_stacks(
                    opt_state["m"], self.device_graph
                ),
                "v": unpad_relation_stacks(
                    opt_state["v"], self.device_graph
                ),
                "t": opt_state["t"],
            }
        return {
            "params": params,
            "opt_state": opt_state,
            "global_step": self.global_step,
            "opt_step": self.opt_step,
        }

    def load_state_dict(self, state: Dict) -> None:
        params = state["params"]
        opt_state = state["opt_state"]
        if self.shard_weights:
            from decagon_tpu.parallel.sharded import (
                pad_relation_stacks,
                shard_state_tree,
            )

            params = shard_state_tree(
                pad_relation_stacks(params, self.device_graph),
                self.device_graph, self.mesh,
            )
            opt_state = shard_state_tree(
                {
                    "m": pad_relation_stacks(
                        opt_state["m"], self.device_graph
                    ),
                    "v": pad_relation_stacks(
                        opt_state["v"], self.device_graph
                    ),
                    "t": opt_state["t"],
                },
                self.device_graph, self.mesh,
            )
        self.params = params
        self.opt_state = opt_state
        self.global_step = int(state["global_step"])
        self.opt_step = int(
            state.get("opt_step", self.global_step // self.group)
        )

    def try_resume(self, checkpointer) -> bool:
        """Restore the latest checkpoint if one exists; returns whether a
        restore happened (the reference's ``restore()`` existed but the
        training loop never called it — SURVEY.md §5.4)."""
        state = checkpointer.restore_latest(template=self.state_dict())
        if state is None:
            return False
        self.load_state_dict(state)
        return True

    def train_batch(self, batch: Minibatch) -> float:
        step_fn = self.steps[batch.edge_type]
        # RNG folding happens in-jit: eager fold_in would pay a dispatch
        # round trip per step (tens of ms on remote-attached chips).
        self.params, self.opt_state, loss = step_fn(
            self.params,
            self.opt_state,
            self.device_graph,
            np.int32(batch.k),
            batch.rows,
            batch.cols,
            self.step_rng,
            np.int32(self.global_step),
        )
        self.global_step += 1
        self.opt_step += 1
        return loss

    def train_chunk(self, batches: list, chunk_size: int) -> jax.Array:
        """Run up to ``chunk_size`` optimization steps in ONE device
        dispatch (``make_chunked_train_step``); fewer batches are padded
        with masked no-op steps.  Returns the per-step losses
        ``[len(batches)]`` as a DEVICE array (no forced sync — callers
        overlap host-side work for the next chunk with device execution
        and materialize losses only when they read them).  Loss traces
        match ``train_batch`` exactly (same per-step RNG stream)."""
        if self._chunk_fn is None:
            if self.mesh is not None and self.group > 1:
                from decagon_tpu.parallel.sharded import (
                    make_sharded_grouped_chunked_train_step,
                )

                self._chunk_fn = make_sharded_grouped_chunked_train_step(
                    self.model, self.config, self.optimizer, self.mesh,
                    self.device_graph,
                    shard_weights=self.shard_weights,
                )
            elif self.mesh is not None:
                from decagon_tpu.parallel.sharded import (
                    make_sharded_chunked_train_step,
                )

                self._chunk_fn = make_sharded_chunked_train_step(
                    self.model, self.config, self.optimizer, self.mesh,
                    self.device_graph,
                    shard_weights=self.shard_weights,
                )
            elif self.group > 1:
                from decagon_tpu.train.step import (
                    make_grouped_chunked_train_step,
                )

                self._chunk_fn = make_grouped_chunked_train_step(
                    self.model, self.device_graph, self.config,
                    self.optimizer,
                )
            else:
                from decagon_tpu.train.step import make_chunked_train_step

                self._chunk_fn = make_chunked_train_step(
                    self.model, self.device_graph, self.config,
                    self.optimizer,
                )
        n = len(batches)
        g = self.group
        assert 0 < n <= chunk_size * g
        b = self.config.batch_size
        if g > 1:
            # Grouped slots: G relation-batches per optimization step,
            # one shared encoder forward per slot.  Slot RNG indices
            # count optimization steps (global_step counts batches).
            branch = np.zeros((chunk_size, g), np.int32)
            ks = np.zeros((chunk_size, g), np.int32)
            rows = np.zeros((chunk_size, g, b), np.int32)
            cols = np.zeros((chunk_size, g, b), np.int32)
            step_no = np.zeros(chunk_size, np.int32)
            valid = np.zeros((chunk_size, g), bool)
            slot0 = self.opt_step
            for j, batch in enumerate(batches):
                s, gg = divmod(j, g)
                branch[s, gg] = self._branch_idx[batch.edge_type]
                ks[s, gg] = batch.k
                rows[s, gg] = batch.rows
                cols[s, gg] = batch.cols
                valid[s, gg] = True
            step_no[:] = slot0 + np.arange(chunk_size)
            self.params, self.opt_state, losses = self._chunk_fn(
                self.params, self.opt_state, self.device_graph,
                self.step_rng, jnp.asarray(branch), jnp.asarray(ks),
                jnp.asarray(rows), jnp.asarray(cols),
                jnp.asarray(step_no), jnp.asarray(valid),
            )
            self.global_step += n
            self.opt_step += -(-n // g)
            return losses[: -(-n // g)]
        branch = np.zeros(chunk_size, np.int32)
        ks = np.zeros(chunk_size, np.int32)
        rows = np.zeros((chunk_size, b), np.int32)
        cols = np.zeros((chunk_size, b), np.int32)
        step_no = np.zeros(chunk_size, np.int32)
        valid = np.zeros(chunk_size, bool)
        for j, batch in enumerate(batches):
            branch[j] = self._branch_idx[batch.edge_type]
            ks[j] = batch.k
            rows[j] = batch.rows
            cols[j] = batch.cols
            step_no[j] = self.global_step + j
            valid[j] = True
        self.params, self.opt_state, losses = self._chunk_fn(
            self.params, self.opt_state, self.device_graph, self.step_rng,
            jnp.asarray(branch), jnp.asarray(ks), jnp.asarray(rows),
            jnp.asarray(cols), jnp.asarray(step_no), jnp.asarray(valid),
        )
        self.global_step += n
        self.opt_step += n
        return losses[:n]

    def _train_epoch_scanned(self, epoch: int, chunk_size: int) -> None:
        batches = list(self.scheduler.epoch())
        per_call = chunk_size * self.group
        iteration = 0
        for i in range(0, len(batches), per_call):
            group = batches[i : i + per_call]
            start = time.perf_counter()
            losses = self.train_chunk(group, chunk_size)
            if self.iteration_hook is not None:
                # Materializing the losses synchronizes; skip it when
                # nobody listens so chunk dispatches pipeline on device.
                losses = np.asarray(losses)
                latency = (time.perf_counter() - start) / len(group)
                if self.group > 1:
                    # Grouped mode: one loss per optimization step (slot
                    # of G batches); report it against the slot's first
                    # batch's edge type.
                    for s, loss in enumerate(losses):
                        batch = group[s * self.group]
                        self.iteration_hook(
                            self,
                            IterationResult(
                                epoch=epoch,
                                iteration=iteration,
                                loss=float(loss),
                                latency=latency * self.group,
                                edge_type=(*batch.edge_type, batch.k),
                            ),
                        )
                        iteration += 1
                    continue
                for batch, loss in zip(group, losses):
                    self.iteration_hook(
                        self,
                        IterationResult(
                            epoch=epoch,
                            iteration=iteration,
                            loss=float(loss),
                            latency=latency,
                            edge_type=(*batch.edge_type, batch.k),
                        ),
                    )
                    iteration += 1

    def train(self, num_epochs: Optional[int] = None) -> None:
        epochs = num_epochs or self.config.num_epochs
        for epoch in range(epochs):
            if self.config.scan_chunk > 0:
                self._train_epoch_scanned(epoch, self.config.scan_chunk)
            else:
                iteration = 0
                for batch in self.scheduler.epoch():
                    start = time.perf_counter()
                    loss = self.train_batch(batch)
                    if self.iteration_hook is not None:
                        # Block for an honest latency only when someone
                        # listens.
                        loss = float(loss)
                        latency = time.perf_counter() - start
                        self.iteration_hook(
                            self,
                            IterationResult(
                                epoch=epoch,
                                iteration=iteration,
                                loss=loss,
                                latency=latency,
                                edge_type=(*batch.edge_type, batch.k),
                            ),
                        )
                    iteration += 1
            if self.epoch_hook is not None:
                self.epoch_hook(self, epoch)
