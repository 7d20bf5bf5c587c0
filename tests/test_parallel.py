"""Multi-chip (virtual 8-device CPU mesh) sharding tests.

The crucial properties of the (row, edge) sharded path
(``decagon_tpu.parallel``):

* row-block + edge-shard aggregation with psum/all_gather produces the
  SAME loss and gradients as the single-chip computation (deterministic
  setting), on 1D (1 x 8) and 2D (2 x 4) meshes;
* density dispatch survives sharding: the sharded dense einsum path
  matches the sharded XLA segment-sum path;
* the Trainer API drives the sharded step end-to-end and learns, and the
  evaluator + logger combination works against a mesh trainer.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.parallel.mesh import make_mesh
from decagon_tpu.parallel.rowshard import (
    build_sharded_device_graph,
    sharded_pspecs,
)
from decagon_tpu.parallel.sharded import (
    encode_sharded,
    make_sharded_embed_fn,
    make_sharded_train_step,
)
from decagon_tpu.train.step import TrainConfig, make_optimizer


@pytest.fixture(scope="module")
def world():
    graph = make_synthetic_graph(
        n_genes=80, n_drugs=48, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.15, test_frac=0.1, seed=3)
    device_graph = build_device_graph(graph, splits, edge_pad_multiple=256)
    model = DecagonModel(
        ModelConfig(hidden1=16, hidden2=8, dropout=0.0), device_graph
    )
    params = model.init_params(jax.random.PRNGKey(0), device_graph)
    return graph, splits, device_graph, model, params


def _sharded_loss_grads(model, mesh, sgraph, params, rows, cols, impl):
    edge_type = (1, 1)
    k = jnp.int32(0)

    def local_loss(params, g, rows, cols):
        emb = encode_sharded(
            params, g, None, deterministic=True, spmm_impl=impl
        )
        scores = model.score_edges(
            params, g, emb, edge_type, k, rows, cols, deterministic=True
        )
        return jnp.sum(jnp.tanh(scores))

    def local_grads(params, g, rows, cols):
        loss, grads = jax.value_and_grad(local_loss)(params, g, rows, cols)
        return (
            jax.lax.psum(loss, ("row", "edge")),
            jax.lax.psum(grads, ("row", "edge")),
        )

    return jax.jit(
        jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(
                P(), sharded_pspecs(sgraph),
                P(("row", "edge")), P(("row", "edge")),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(params, sgraph, rows, cols)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_loss_and_grads_match_single_chip(world, shape):
    graph, splits, device_graph, model, params = world
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(shape=shape)
    sgraph = build_sharded_device_graph(graph, splits, mesh)

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)

    def single_loss(params, g):
        emb = model.embeddings(params, g, deterministic=True)
        scores = model.score_edges(
            params, g, emb, (1, 1), jnp.int32(0), rows, cols,
            deterministic=True,
        )
        return jnp.sum(jnp.tanh(scores))

    want_loss, want_grads = jax.value_and_grad(single_loss)(
        params, device_graph
    )
    got_loss, got_grads = _sharded_loss_grads(
        model, mesh, sgraph, params, rows, cols, impl="xla"
    )

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    flat_want = jax.tree_util.tree_leaves(want_grads)
    flat_got = jax.tree_util.tree_leaves(got_grads)
    assert len(flat_want) == len(flat_got)
    for w, g in zip(flat_want, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5
        )


def test_sharded_dense_matches_sharded_xla(world):
    """Density dispatch under the mesh: the per-device [K_loc, Nb, Nj]
    dense einsum equals the sharded segment-sum (VERDICT round-1 item 3)."""
    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    sgraph = build_sharded_device_graph(graph, splits, mesh)
    assert any(a.dense is not None for a in sgraph.adj.values())

    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)

    loss_d, grads_d = _sharded_loss_grads(
        model, mesh, sgraph, params, rows, cols, impl="dense"
    )
    loss_x, grads_x = _sharded_loss_grads(
        model, mesh, sgraph, params, rows, cols, impl="xla"
    )
    np.testing.assert_allclose(float(loss_d), float(loss_x), rtol=1e-5)
    for d, x in zip(
        jax.tree_util.tree_leaves(grads_d), jax.tree_util.tree_leaves(grads_x)
    ):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(x), rtol=2e-4, atol=1e-5
        )


def test_sharded_pallas_matches_sharded_xla(world):
    """Per-shard Pallas tilings under the mesh (interpret mode on CPU):
    the tiled kernel path equals the sharded segment-sum, fwd and bwd."""
    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    sgraph = build_sharded_device_graph(
        graph, splits, mesh,
        tile_for_pallas=True, tile_block=64, tile_even_if_dense=True,
    )
    assert all(a.tiles_fwd is not None for a in sgraph.adj.values())

    rng = np.random.default_rng(2)
    rows = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)

    loss_p, grads_p = _sharded_loss_grads(
        model, mesh, sgraph, params, rows, cols, impl="pallas_interpret"
    )
    loss_x, grads_x = _sharded_loss_grads(
        model, mesh, sgraph, params, rows, cols, impl="xla"
    )
    np.testing.assert_allclose(
        float(loss_p), float(loss_x), rtol=1e-4, atol=1e-6
    )
    for p, x in zip(
        jax.tree_util.tree_leaves(grads_p), jax.tree_util.tree_leaves(grads_x)
    ):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(x), rtol=2e-4, atol=1e-5
        )


def test_sharded_embed_matches_single_chip(world):
    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    sgraph = build_sharded_device_graph(graph, splits, mesh)
    want = model.embeddings(params, device_graph, deterministic=True)
    got = make_sharded_embed_fn(model, mesh, sgraph)(params, sgraph)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]),
            rtol=2e-5, atol=1e-6,
        )


def test_trainer_with_mesh_end_to_end(world):
    """The Trainer API drives the sharded step over the full round-robin
    schedule on a 2D mesh; the evaluator + logger combination works
    against the mesh trainer (VERDICT round-1 item 9)."""
    import tempfile

    from decagon_tpu.train.evaluate import AccuracyEvaluator
    from decagon_tpu.train.logger import MetricsLogger
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2, num_epochs=1)
    trainer = Trainer(
        model, graph, splits, device_graph, cfg, seed=0, mesh=mesh
    )
    evaluator = AccuracyEvaluator(
        model, graph, splits, embed_fn=trainer.embed_fn
    )
    with tempfile.TemporaryDirectory() as tmp:
        logger = MetricsLogger(
            evaluator, result_dir=tmp, every_n_iterations=4, quiet=True
        )
        trainer.iteration_hook = logger.on_iteration
        trainer.epoch_hook = logger.on_epoch_end
        trainer.train(num_epochs=1)
        logger.close()
        import csv

        with open(logger.path) as f:
            rows = list(csv.DictReader(f))
    assert trainer.global_step > 0
    assert rows  # at least one eval row
    # Epoch-end row pools every drug-drug relation through the sharded
    # forward; AUROC must be a real number.
    assert rows[-1]["EvaluateAll"] == "True"
    assert 0.0 <= float(rows[-1]["AUROC"]) <= 1.0

def test_mesh_scan_chunk_matches_per_step(world):
    """The scanned-chunk sharded step (one dispatch per chunk of
    optimization steps) produces the SAME loss trace as the per-step
    sharded path — identical RNG stream, psum'd grads, Adam updates
    (VERDICT r2 item 1: the mesh path previously had no scan_chunk)."""
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    losses = {}
    for chunk in (0, 4):
        cfg = TrainConfig(
            batch_size=64, learning_rate=1e-2, scan_chunk=chunk
        )
        trainer = Trainer(
            model, graph, splits, device_graph, cfg, seed=0, mesh=mesh
        )
        trace = []
        trainer.iteration_hook = lambda t, r: trace.append(r.loss)
        trainer.train(num_epochs=1)
        losses[chunk] = np.asarray(trace)
    assert losses[0].shape == losses[4].shape
    np.testing.assert_allclose(losses[4], losses[0], rtol=2e-4, atol=1e-6)


def test_mesh_trainer_checkpoint_resume(world, tmp_path):
    """Mesh-trainer lifecycle (VERDICT r2 item 7): checkpoint replicated
    state from a mesh trainer, resume into a FRESH mesh trainer, and
    keep training — params match bit-for-bit after restore."""
    from decagon_tpu.train.checkpoint import Checkpointer
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2)
    t1 = Trainer(model, graph, splits, device_graph, cfg, seed=0, mesh=mesh)
    for batch in list(t1.scheduler.epoch())[:4]:
        t1.train_batch(batch)
    ckpt = Checkpointer(str(tmp_path / "ck"), max_to_keep=1)
    ckpt.save(t1.global_step, t1.state_dict())

    t2 = Trainer(model, graph, splits, device_graph, cfg, seed=0, mesh=mesh)
    assert t2.try_resume(ckpt)
    assert t2.global_step == t1.global_step
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params),
        jax.tree_util.tree_leaves(t2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for batch in list(t2.scheduler.epoch())[:2]:
        loss = t2.train_batch(batch)
    assert np.isfinite(float(loss))


def test_cli_mesh_end_to_end_with_active_learning(tmp_path):
    """CLI MeshShape on the virtual mesh, full lifecycle: masking
    active-learner outer loop driving a mesh trainer, checkpointing on,
    then a resume run (VERDICT r2 item 7)."""
    import json
    import os

    from decagon_tpu import cli

    conf = {
        "DataSetType": "DecagonDummyData",
        "ActiveLearnerType": "RandomMaskingActiveLearner",
        "InitialUnmaskedProportion": 0.5,
        "NumProteins": 60,
        "NumDrugs": 30,
        "NumDrugDrugRelationTypes": 1,
        "hidden1": 8,
        "hidden2": 4,
        "batch_size": 16,
        "NumEpochs": 1,
        "NumIterationsPerLog": 50,
        "TrainIterationResultDir": str(tmp_path / "results"),
        "ShouldCheckpoint": True,
        "CheckpointDirectory": str(tmp_path / "ck"),
        "NumIterationsPerCheckpoint": 4,
        "ValFraction": 0.1,
        "TestFraction": 0.05,
        "MeshShape": [2, 4],
    }
    path = tmp_path / "conf.json"
    path.write_text(json.dumps(conf))
    cli.main(["--config", str(path)])
    results = os.listdir(tmp_path / "results")
    assert any(f.startswith("decagon_iteration_results") for f in results)
    assert os.listdir(tmp_path / "ck")  # checkpoints written

    # Resume path: a fresh single-iteration run restoring the checkpoint.
    conf["ActiveLearnerType"] = "NoopActiveLearner"
    conf["ResumeFromCheckpoint"] = True
    path.write_text(json.dumps(conf))
    cli.main(["--config", str(path)])


def test_sharded_train_step_runs_and_learns(world):
    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    sgraph = build_sharded_device_graph(graph, splits, mesh)
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(
        model, (1, 1), cfg, optimizer, mesh, sgraph
    )

    train = splits[(1, 1, 0)].train
    losses = []
    # The step donates its params/opt_state args; keep the module
    # fixture's params alive for later tests.
    p = jax.tree.map(jnp.copy, params)
    for it in range(12):
        idx = np.random.default_rng(it).integers(0, len(train), size=64)
        rows = jnp.asarray(train[idx, 0])
        cols = jnp.asarray(train[idx, 1])
        p, opt_state, loss = step(
            p, opt_state, sgraph, jnp.int32(0), rows, cols,
            jax.random.PRNGKey(0), jnp.int32(it),
        )
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (4, 2), (8, 1)])
def test_weight_sharded_grads_match_single_chip(world, shape):
    """Relation-sharded enc weights (shard_weights): loss and UNPADDED
    gradients must equal the single-chip computation exactly.  The
    sharded leaves' grads arrive through the explicit-adjoint
    collectives (edge_accum/gather_rows backward) plus a row-axis psum;
    replicated leaves keep the both-axes psum."""
    from decagon_tpu.parallel.sharded import (
        _psum_replicated_leaves,
        make_param_pspecs,
        pad_relation_stacks,
        shard_state_tree,
        shardable_weight_keys,
        unpad_relation_stacks,
    )

    graph, splits, device_graph, model, params = world
    # Earlier tests feed the fixture's params through donating steps;
    # work on a private copy.
    params = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    cols = jnp.asarray(rng.integers(0, 48, size=64), jnp.int32)
    et, k = (1, 1), jnp.int32(0)

    def single_loss(p, gd):
        emb = model.embeddings(p, gd, deterministic=True)
        return jnp.sum(jnp.tanh(model.score_edges(
            p, gd, emb, et, k, rows, cols, deterministic=True)))

    want_loss, want_grads = jax.value_and_grad(single_loss)(
        params, device_graph
    )

    mesh = make_mesh(shape=shape)
    sg = build_sharded_device_graph(graph, splits, mesh)
    keys = shardable_weight_keys(sg)
    assert keys, "fixture must densify at least one edge type"
    pp = shard_state_tree(pad_relation_stacks(params, sg), sg, mesh)
    p_specs = make_param_pspecs(sg)
    g_specs = sharded_pspecs(sg)

    def local_loss(p, gd, r, c):
        emb = encode_sharded(
            p, gd, None, deterministic=True, spmm_impl="auto",
            sharded_keys=keys,
        )
        sc = model.score_edges(p, gd, emb, et, k, r, c, deterministic=True)
        return jnp.sum(jnp.tanh(sc))

    def local_grads(p, gd, r, c):
        loss, grads = jax.value_and_grad(local_loss)(p, gd, r, c)
        grads = _psum_replicated_leaves(grads, keys, ("row", "edge"))
        return jax.lax.psum(loss, ("row", "edge")), grads

    fn = jax.jit(jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(p_specs, g_specs, P(("row", "edge")), P(("row", "edge"))),
        out_specs=(P(), p_specs), check_vma=False,
    ))
    got_loss, got_grads = fn(pp, sg, rows, cols)
    got_grads = unpad_relation_stacks(got_grads, sg)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for w, g in zip(
        jax.tree_util.tree_leaves(want_grads),
        jax.tree_util.tree_leaves(got_grads),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=1e-5
        )


def test_weight_sharded_trainer_matches_replicated_trainer(world):
    """The mesh Trainer with shard_weights=True must produce the SAME
    loss trace and post-training parameters as shard_weights=False on
    the same mesh (identical RNG streams; dropout=0 fixture)."""
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer
    from decagon_tpu.parallel.sharded import unpad_relation_stacks

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    batches = None
    results = {}
    for sw in (False, True):
        t = Trainer(
            model, graph, splits, device_graph,
            TrainConfig(batch_size=64, shard_weights=sw), seed=0, mesh=mesh,
        )
        assert t.shard_weights == sw
        if batches is None:
            batches = list(t.scheduler.epoch())[:6]
        losses = [float(t.train_batch(b)) for b in batches]
        p = t.params
        if sw:
            p = unpad_relation_stacks(p, t.device_graph)
        results[sw] = (losses, p)

    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][1]),
        jax.tree_util.tree_leaves(results[False][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_weight_sharded_bf16_grad_reduce_close(world):
    """grad_reduce_dtype='bfloat16' (cross-host wire compression for the
    sharded-leaf row psum) must track the fp32 trainer's loss trace to
    bf16 tolerance."""
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    mesh = make_mesh(shape=(2, 4))
    batches = None
    traces = {}
    for dt in ("float32", "bfloat16"):
        t = Trainer(
            model, graph, splits, device_graph,
            TrainConfig(batch_size=64, grad_reduce_dtype=dt),
            seed=0, mesh=mesh,
        )
        if batches is None:
            batches = list(t.scheduler.epoch())[:6]
        traces[dt] = [float(t.train_batch(b)) for b in batches]
    np.testing.assert_allclose(
        traces["bfloat16"], traces["float32"], rtol=2e-2
    )


def test_mesh_checkpoint_topology_independent(world, tmp_path):
    """Checkpoints from a weight-sharded mesh trainer restore into a
    DIFFERENT mesh shape and into the single-chip trainer (ADVICE r3:
    state_dict unpads the edge-sharded relation stacks; load_state_dict
    re-pads and re-shards for the restoring topology)."""
    from decagon_tpu.train.checkpoint import Checkpointer
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    cfg = TrainConfig(batch_size=64, learning_rate=1e-2)
    t1 = Trainer(
        model, graph, splits, device_graph, cfg, seed=0,
        mesh=make_mesh(shape=(2, 4)),
    )
    assert t1.shard_weights, "fixture must exercise the sharded-leaf path"
    for batch in list(t1.scheduler.epoch())[:4]:
        t1.train_batch(batch)
    ckpt = Checkpointer(str(tmp_path / "ck_topo"), max_to_keep=1)
    ckpt.save(t1.global_step, t1.state_dict())
    ckpt.wait()
    want = jax.tree_util.tree_map(np.asarray, t1.state_dict())

    # Same params through a (1, 8) mesh and through the single-chip
    # trainer: the checkpoint is topology-free (unpadded num_rel stacks).
    t2 = Trainer(
        model, graph, splits, device_graph, cfg, seed=0,
        mesh=make_mesh(shape=(1, 8)),
    )
    assert t2.try_resume(ckpt)
    t3 = Trainer(model, graph, splits, device_graph, cfg, seed=0)
    assert t3.try_resume(ckpt)
    for t in (t2, t3):
        got = jax.tree_util.tree_map(np.asarray, t.state_dict())
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(got),
        ):
            assert pa == pb
            np.testing.assert_array_equal(a, b)
        loss = None
        for batch in list(t.scheduler.epoch())[:2]:
            loss = t.train_batch(batch)
        assert np.isfinite(float(loss))


def test_mesh_trainer_large_hidden(world):
    """BASELINE config 5 names 'large hidden dims' for the multi-host
    slice: one weight-sharded mesh chunk at hidden 256->128 (8x the
    paper dims) must compile, run, and stay finite."""
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    big = DecagonModel(
        ModelConfig(hidden1=256, hidden2=128, dropout=0.0), device_graph
    )
    cfg = TrainConfig(batch_size=64, learning_rate=1e-3, scan_chunk=2)
    trainer = Trainer(
        big, graph, splits, device_graph, cfg, seed=0,
        mesh=make_mesh(shape=(2, 4)),
    )
    assert trainer.shard_weights
    batches = list(trainer.scheduler.epoch())[:2]
    losses = np.asarray(trainer.train_chunk(batches, 2))
    assert np.all(np.isfinite(losses))


def test_mesh_trainer_grouped_step(world):
    """relation_group > 1 on a mesh: G relation-batches share one
    sharded encoder forward per optimization step (one boundary
    exchange per G batches); trains finite and learns."""
    from decagon_tpu.train.trainer import Trainer

    graph, splits, device_graph, model, params = world
    cfg = TrainConfig(
        batch_size=64, learning_rate=1e-2, scan_chunk=3,
        schedule="balanced", relation_group=2,
    )
    trainer = Trainer(
        model, graph, splits, device_graph, cfg, seed=0,
        mesh=make_mesh(shape=(2, 4)),
    )
    losses = []
    trainer.iteration_hook = lambda t, r: losses.append(r.loss)
    trainer.train(num_epochs=4)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
