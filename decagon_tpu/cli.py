"""End-to-end training CLI.

Capability spec: reference ``main/main.py:74-91`` — config → dataset →
active learner → loop(get masked dataset → build trainable → train) —
plus the recorded held-out-edge CSV and checkpoint/metrics plumbing.

Usage::

    python -m decagon_tpu.cli --config configuration.json
    python -m decagon_tpu.cli --config conf.json --set NumEpochs=5

Config keys follow the reference's ``configuration.json`` (DataSetType,
ActiveLearnerType, hidden1/hidden2, dropout, batch_size, learning_rate,
max_margin, NumEpochs, TestSetProportion, InitTrainSetProportion,
CheckpointDirectory, TrainIterationResultDir, NumIterationsPerLog,
NumIterationsPerCheckpoint, MaxCheckpointsToKeep, TestEdgeFilename,
WriteNdarrays, NdarrayWriteDir, file paths for the public CSVs, …).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from decagon_tpu.config import Config
from decagon_tpu.data.public import load_public_dataset
from decagon_tpu.data.record import timestamped_path, write_heldout_edges_csv
from decagon_tpu.graph.container import RelationGraph
from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.train.checkpoint import Checkpointer
from decagon_tpu.train.evaluate import AccuracyEvaluator
from decagon_tpu.train.logger import MetricsLogger
from decagon_tpu.train.trainer import Trainer


def _side_effect_subset(config: Config):
    """``SideEffectSubset`` config -> relation allowlist (or None).

    Accepts a named variant ("neutropenia" / "hyperglycaemia" /
    "anosmia" — the reference's per-side-effect AdjMtxBuilder
    subclasses, ``NeutropeniaAdjMtxBuilder.py:5-11`` etc.), a single
    relation id, or a list of either."""
    from decagon_tpu.data.public import NAMED_SIDE_EFFECTS

    raw = config.get("SideEffectSubset", None)
    if raw is None:
        return None
    items = raw if isinstance(raw, (list, tuple)) else [raw]
    subset = set()
    for item in items:
        if isinstance(item, str) and not item.isdigit():
            try:
                subset.add(NAMED_SIDE_EFFECTS[item.lower()])
            except KeyError:
                raise ValueError(
                    f"unknown side-effect name {item!r}; known: "
                    f"{sorted(NAMED_SIDE_EFFECTS)} (or pass relation ids)"
                )
        else:
            subset.add(int(item))
    return subset


def build_dataset(config: Config):
    """Returns (graph_without_transposes, protein_ids, drug_ids, names)."""
    dataset_type = config.get("DataSetType", "DecagonDummyData")
    if dataset_type == "DecagonPublicData":
        ds = load_public_dataset(
            combo_path=config.get("DecagonDrugDrugRelationsFilename"),
            ppi_path=config.get("DecagonProteinProteinRelationsFilename"),
            targets_path=config.get("DecagonDrugProteinRelationsFilename"),
            mono_path=(
                config.get("DecagonNodeFeaturesFilename", None)
                if config.get("UseMonoFeatures", True)
                else None
            ),
            min_edges_per_relation=int(config.get("MinEdgesPerRelation", 500)),
            relation_allowlist=_side_effect_subset(config),
            drug_decoder=config.get("DrugDrugEdgeDecoder", "dedicom"),
            other_decoder=config.get("PPIEdgeDecoder", "bilinear"),
            with_transposes=False,
        )
        return ds.graph, ds.protein_ids, ds.drug_ids, ds.relation_names
    if dataset_type == "DecagonDummyData":
        graph = make_synthetic_graph(
            n_genes=int(config.get("NumProteins", 500)),
            n_drugs=int(config.get("NumDrugs", 400)),
            n_drugdrug_types=int(config.get("NumDrugDrugRelationTypes", 3)),
            seed=int(config.get("Seed", 0)),
            with_transposes=False,
            drug_decoder=config.get("DrugDrugEdgeDecoder", "dedicom"),
            other_decoder=config.get("PPIEdgeDecoder", "bilinear"),
        )
        names = [r.name for r in graph.relations[(1, 1)]]
        return (
            graph,
            list(range(graph.num_nodes[0])),
            list(range(graph.num_nodes[1])),
            names,
        )
    raise ValueError(f"unknown DataSetType: {dataset_type}")


def build_active_learner(config: Config, graph: RelationGraph):
    from decagon_tpu import registry
    from decagon_tpu.train.active import BaseActiveLearner

    kind = config.get("ActiveLearnerType", "NoopActiveLearner")
    seed = int(config.get("Seed", 0))
    if kind == "NoopActiveLearner":
        return registry.build(BaseActiveLearner, kind, graph=graph)
    kwargs = dict(
        graph=graph,
        test_set_proportion=float(config.get("TestSetProportion", 0.8)),
        init_train_proportion=float(config.get("InitTrainSetProportion", 1.0)),
        seed=seed,
    )
    if kind == "RelationFullMaskingLearner":
        kwargs["invalid_relations"] = set(
            config.get("InvalidRelationIds", [])
        )
    return registry.build(BaseActiveLearner, kind, **kwargs)


def train_once(
    config: Config,
    graph: RelationGraph,
    holdout,
    dataset_id: str,
    protein_ids,
    drug_ids,
    relation_names,
    learner=None,
) -> Trainer:
    model_cfg = config.model_config()
    train_cfg = config.train_config()
    seed = int(config.get("Seed", 0))

    full = (
        graph.with_transposes()
        if bool(config.get("TrainWithTransposedAdjacencyMatrices", True))
        else graph
    )
    node_perms = None
    if bool(config.get("RenumberNodes", False)):
        # Degree-clustered relabeling (graph/renumber.py): concentrates
        # the Pallas SpMM kernel's source windows.  The external-id
        # lists are permuted alongside so the held-out CSV keeps STITCH
        # ids correct, active-learner holdouts are translated in, and
        # npy exports restore external row order on the way out.
        from decagon_tpu.graph.renumber import renumber_by_degree

        full, node_perms = renumber_by_degree(full)
        inv = {
            t: np.argsort(node_perms[t]) for t in node_perms
        }
        protein_ids = [protein_ids[o] for o in node_perms[0]]
        drug_ids = [drug_ids[o] for o in node_perms[1]]
        if holdout:
            holdout = {
                k: {
                    tag: inv[1][np.asarray(edges).reshape(-1, 2)]
                    for tag, edges in h.items()
                }
                for k, h in holdout.items()
            }
    splits = split_graph(
        full,
        val_frac=float(config.get("ValFraction", 0.05)),
        test_frac=float(config.get("TestFraction", 0.0)),
        seed=seed,
        precomputed_holdout=holdout or None,
        min_holdout=int(config.get("MinHoldoutEdges", 50)),
        holdout_cap_frac=float(config.get("HoldoutCapFraction", 0.25)),
    )
    if config.has("TestEdgeFilename"):
        path = write_heldout_edges_csv(
            full, splits, timestamped_path(config.get("TestEdgeFilename")),
            protein_ids=protein_ids, drug_ids=drug_ids,
            relation_names=relation_names,
        )
        print(f"recorded held-out edges -> {path}")

    import jax
    import jax.numpy as jnp

    device_graph = build_device_graph(
        full, splits,
        tile_for_pallas=(
            "pallas" in model_cfg.spmm_impl
            or (
                model_cfg.spmm_impl == "auto"
                and jax.default_backend() != "cpu"
            )
        ),
        densify_max_cells=int(config.get("DensifyMaxCells", 8_000_000)),
        dense_dtype=(
            jnp.bfloat16
            if str(config.get("DenseDtype", "f32")) in ("bf16", "bfloat16")
            else np.float32
        ),
        # int8 factored stacks (half the dense path's HBM traffic).
        dense_factored=bool(
            config.get(
                "DenseFactored", jax.default_backend() != "cpu"
            )
        ),
        # Paired half-mask stacks + Pallas kernels (round 5) — what
        # spmm_impl="auto" prefers on TPU when built: one int8 mask
        # read serves both transpose halves of a square edge type.
        dense_paired=bool(
            config.get(
                "DensePaired", jax.default_backend() != "cpu"
            )
        ),
    )
    model = DecagonModel(model_cfg, device_graph)

    # Multi-chip: "MeshShape": [rows, edge_shards] partitions the
    # adjacency over a (row, edge) mesh (decagon_tpu.parallel); with
    # "DistributedInit": true the trainer first initializes
    # jax.distributed for a multi-host slice.
    mesh = None
    if config.has("MeshShape"):
        from decagon_tpu.parallel.mesh import initialize_distributed, make_mesh

        if bool(config.get("DistributedInit", False)):
            initialize_distributed()
        shape = config.get("MeshShape")
        mesh = make_mesh(
            shape=tuple(int(x) for x in shape),
            multihost=bool(config.get("MultiHostMesh", False)),
        )

    checkpointer = None
    if bool(config.get("ShouldCheckpoint", False)):
        checkpointer = Checkpointer(
            config.get("CheckpointDirectory", "ckpts"),
            max_to_keep=int(config.get("MaxCheckpointsToKeep", 3)),
            every_n_iterations=int(config.get("NumIterationsPerCheckpoint", 1)),
        )

    trainer = Trainer(
        model, full, splits, device_graph, train_cfg, seed=seed, mesh=mesh
    )
    evaluator = AccuracyEvaluator(
        model, full, splits, apk_k=int(config.get("ApkRank", 50)),
        embed_fn=trainer.embed_fn,
    )
    logger = MetricsLogger(
        evaluator,
        result_dir=config.get("TrainIterationResultDir", "results"),
        dataset_id=dataset_id,
        every_n_iterations=int(config.get("NumIterationsPerLog", 1)),
        checkpointer=checkpointer,
        ndarray_dir=(
            config.get("NdarrayWriteDir", "ndarray-dump")
            if bool(config.get("WriteNdarrays", False))
            else None
        ),
        relation_names=relation_names,
        node_perms=node_perms,
    )

    trainer.iteration_hook = logger.on_iteration
    trainer.epoch_hook = logger.on_epoch_end
    if checkpointer is not None and bool(
        config.get("ResumeFromCheckpoint", False)
    ):
        if trainer.try_resume(checkpointer):
            print(f"resumed from checkpoint at step {trainer.global_step}")
    profile_dir = config.get("ProfileDir", None)
    if profile_dir:
        # JAX profiler traces (view with tensorboard/xprof).  The
        # reference's only tracing was the wall-clock Latency CSV column
        # (SURVEY.md §5.1); both are emitted here.
        import jax.profiler

        jax.profiler.start_trace(profile_dir)
    if learner is not None and hasattr(learner, "scorer"):
        # Wire the greedy learner to the live model: ONE encoder forward
        # + one chunked scoring dispatch per selection round, regardless
        # of relation count (VERDICT r2 item 8 — the per-relation scorer
        # recomputed the full forward and re-staged indices per call).
        def batch_scorer(batches):
            emb = evaluator.embeddings(trainer.params, trainer.device_graph)
            return evaluator._probs_flat(
                trainer.params, emb, (1, 1), batches
            )

        def scorer(k: int, edges: np.ndarray) -> np.ndarray:
            return evaluator._probs(
                trainer.params, trainer.device_graph, (1, 1, k), edges
            )

        learner.scorer = scorer
        if hasattr(learner, "batch_scorer"):
            learner.batch_scorer = batch_scorer
    try:
        trainer.train()
    finally:
        if profile_dir:
            import jax.profiler

            jax.profiler.stop_trace()
        logger.close()
    return trainer


def main(argv=None) -> None:
    config = Config.from_argv(argv)
    graph, protein_ids, drug_ids, relation_names = build_dataset(config)
    learner = build_active_learner(config, graph)

    outer_iter = 0
    while learner.has_update():
        masked_graph, holdout = learner.get_update()
        dataset_id = f"{type(learner).__name__}-iter{outer_iter}"
        print(f"=== active-learning iteration {outer_iter} ===")
        train_once(
            config, masked_graph, holdout, dataset_id,
            protein_ids, drug_ids, relation_names, learner=learner,
        )
        outer_iter += 1


if __name__ == "__main__":
    main()
