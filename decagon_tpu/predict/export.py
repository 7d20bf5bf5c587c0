"""Export offline-predictor artifacts from a saved checkpoint.

Capability spec: reference ``main/Predictor/CheckpointToNdarrayWriter.py``
(``:30-169``) — rebuild the model, restore the latest checkpoint, run the
deterministic forward, and write the artifact set the numpy predictor
consumes (``embeddings.npy``, per-relation ``EmbeddingImportance-<SE>.npy``,
``GlobalRelations.npy``).

Run as a module for the CLI surface::

    python -m decagon_tpu.predict.export --config conf.json \
        --set NdarrayWriteDir=dumps
"""

from __future__ import annotations

from typing import List, Optional

from decagon_tpu.config import Config
from decagon_tpu.graph.device import DeviceGraph
from decagon_tpu.models.model import DecagonModel
from decagon_tpu.train.checkpoint import Checkpointer, export_ndarrays


def export_from_checkpoint(
    model: DecagonModel,
    device_graph: DeviceGraph,
    checkpoint_dir: str,
    out_dir: str,
    params_template,
    relation_names: Optional[List[str]] = None,
) -> None:
    """Restore the latest checkpoint and write the npy artifact set."""
    ckpt = Checkpointer(checkpoint_dir)
    state = ckpt.restore_latest(
        template={"params": params_template}, partial=True
    )
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    params = state["params"]
    embeddings = model.embeddings(params, device_graph, deterministic=True)
    export_ndarrays(
        params, embeddings, device_graph, out_dir,
        relation_names=relation_names,
    )


def main(argv=None) -> None:
    """Config-driven export: rebuild the dataset/model exactly as the
    training CLI does, then restore + dump."""
    import jax

    from decagon_tpu.cli import build_dataset
    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph

    config = Config.from_argv(argv)
    graph, protein_ids, drug_ids, relation_names = build_dataset(config)
    full = (
        graph.with_transposes()
        if bool(config.get("TrainWithTransposedAdjacencyMatrices", True))
        else graph
    )
    splits = split_graph(
        full,
        val_frac=float(config.get("ValFraction", 0.05)),
        test_frac=float(config.get("TestFraction", 0.0)),
        seed=int(config.get("Seed", 0)),
    )
    device_graph = build_device_graph(full, splits)
    model = DecagonModel(config.model_config(), device_graph)
    template = model.init_params(
        jax.random.PRNGKey(int(config.get("Seed", 0))), device_graph
    )
    # The reference's CheckpointToNdarrayWriter writes to NpSaveDir;
    # fall back to the logger's NdarrayWriteDir.
    out_dir = config.get(
        "NpSaveDir", config.get("NdarrayWriteDir", "ndarray-dump")
    )
    export_from_checkpoint(
        model,
        device_graph,
        config.get("CheckpointDirectory", "ckpts"),
        out_dir,
        template,
        relation_names=relation_names,
    )
    print(f"exported artifacts -> {out_dir}")


if __name__ == "__main__":
    main()
