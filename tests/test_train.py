"""Training smoke tests: scheduler parity behavior, loss decrease,
negative sampling distribution, evaluation plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decagon_tpu.graph.device import build_device_graph
from decagon_tpu.graph.split import split_graph
from decagon_tpu.graph.synthetic import make_synthetic_graph
from decagon_tpu.models.model import DecagonModel, ModelConfig
from decagon_tpu.train.evaluate import (
    AccuracyEvaluator,
    average_precision_at_k,
    compute_scores,
)
from decagon_tpu.train.negatives import sample_unigram
from decagon_tpu.train.sampler import MinibatchScheduler
from decagon_tpu.train.step import TrainConfig
from decagon_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def small_world():
    graph = make_synthetic_graph(
        n_genes=100, n_drugs=60, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.15, test_frac=0.1, seed=3)
    device_graph = build_device_graph(graph, splits, edge_pad_multiple=256)
    return graph, splits, device_graph


def test_scheduler_round_robin(small_world):
    graph, splits, _ = small_world
    sched = MinibatchScheduler(graph, splits, batch_size=32, seed=0)
    batches = list(sched.epoch())
    assert batches, "epoch yielded no batches"
    # First three phases are the fixed types in order.
    assert (*batches[0].edge_type, batches[0].k) == (0, 0, 0)
    assert (*batches[1].edge_type, batches[1].k) == (0, 1, 0)
    assert (*batches[2].edge_type, batches[2].k) == (1, 0, 0)
    # Every 4th batch is a *free* relation (non-fixed: the PPI transpose
    # or a drug-drug relation — reference freebatch semantics,
    # minibatch.py:327-345); all shapes static.
    fixed = {(0, 0, 0), (0, 1, 0), (1, 0, 0)}
    assert (*batches[3].edge_type, batches[3].k) not in fixed
    assert all(b.rows.shape == (32,) for b in batches)
    # Free-pool relations eventually exhaust and the epoch terminates;
    # each free relation contributes floor(E/B) batches.
    free_batches = [
        b for b in batches if (*b.edge_type, b.k) not in fixed
    ]
    expected = sum(
        max(splits[key].train.shape[0] // 32,
            1 if splits[key].train.shape[0] else 0)
        for key in splits
        if key not in fixed
    )
    assert len(free_batches) == expected


def test_scheduler_tiny_relations_still_train():
    # A graph whose relations all have fewer edges than batch_size must
    # still yield (wrap-padded, static-shape) batches — the reference fed
    # these as small dynamic batches; dropping them would silently train
    # nothing (minibatch.py:300-301 divergence, documented in sampler.py).
    graph = make_synthetic_graph(
        n_genes=30, n_drugs=20, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.1, seed=1)
    sched = MinibatchScheduler(graph, splits, batch_size=512, seed=0)
    batches = list(sched.epoch())
    assert batches, "tiny graph yielded no batches"
    assert all(b.rows.shape == (512,) for b in batches)
    for b in batches:
        key = (*b.edge_type, b.k)
        train = splits[key].train
        pairs = {tuple(e) for e in train.tolist()}
        got = set(zip(b.rows.tolist(), b.cols.tolist()))
        assert got <= pairs  # only real train edges, wrapped
        # A wrap-padded batch covers the whole (shuffled) relation.
        if train.shape[0] < 512:
            assert len(got) == train.shape[0]
    # Second epoch still terminates and yields again (free pool refills).
    assert list(sched.epoch())


def test_scheduler_epoch_reshuffles(small_world):
    graph, splits, _ = small_world
    sched = MinibatchScheduler(graph, splits, batch_size=32, seed=0)
    first = [b.rows.copy() for b in sched.epoch()][:3]
    second = [b.rows.copy() for b in sched.epoch()][:3]
    assert any(not np.array_equal(a, b) for a, b in zip(first, second))


def test_unigram_sampler_distribution():
    # Distribution ∝ degree^0.75 — verify empirically on a known vector.
    deg = np.array([0.0, 1.0, 8.0, 27.0, 64.0])
    want = deg ** 0.75
    want /= want.sum()
    cdf = jnp.asarray(np.cumsum(want), jnp.float32)
    draws = sample_unigram(jax.random.PRNGKey(0), cdf, 20000)
    counts = np.bincount(np.asarray(draws), minlength=5) / 20000
    assert counts[0] == 0.0  # zero-degree node never sampled
    np.testing.assert_allclose(counts, want, atol=0.02)


def test_training_reduces_loss_and_evaluates(small_world):
    graph, splits, device_graph = small_world
    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8, dropout=0.1), device_graph)
    cfg = TrainConfig(batch_size=32, learning_rate=1e-3, num_epochs=1)
    trainer = Trainer(model, graph, splits, device_graph, cfg, seed=0)

    losses = []
    for epoch in range(3):
        for batch in trainer.scheduler.epoch():
            losses.append(float(trainer.train_batch(batch)))
    assert np.all(np.isfinite(losses))
    early = np.mean(losses[: len(losses) // 4])
    late = np.mean(losses[-len(losses) // 4 :])
    assert late < early, f"loss did not decrease: {early} -> {late}"

    evaluator = AccuracyEvaluator(model, graph, splits)
    scores = evaluator.evaluate(trainer.params, device_graph, (1, 1, 0))
    assert 0.0 <= scores.auroc <= 1.0
    assert 0.0 <= scores.auprc <= 1.0
    pooled = evaluator.evaluate_all_drug_drug(trainer.params, device_graph)
    assert 0.0 <= pooled.auroc <= 1.0


def test_scanned_chunks_match_per_step_path(small_world):
    """The device-resident lax.scan training path must reproduce the
    per-step dispatch path exactly (same RNG stream per step)."""
    graph, splits, device_graph = small_world
    model = DecagonModel(
        ModelConfig(hidden1=8, hidden2=4, dropout=0.1), device_graph
    )
    cfg = TrainConfig(batch_size=32, learning_rate=1e-3)

    t_ref = Trainer(model, graph, splits, device_graph, cfg, seed=7)
    batches = list(t_ref.scheduler.epoch())[:11]
    ref_losses = [float(t_ref.train_batch(b)) for b in batches]

    t_scan = Trainer(model, graph, splits, device_graph, cfg, seed=7)
    got_losses = []
    # Uneven chunks: 4 full-ish, then a padded remainder.
    for i in range(0, len(batches), 4):
        got_losses.extend(t_scan.train_chunk(batches[i : i + 4], 4))
    assert t_scan.global_step == t_ref.global_step == len(batches)

    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        t_scan.params,
        t_ref.params,
    )


def test_trainer_scan_chunk_config(small_world):
    graph, splits, device_graph = small_world
    model = DecagonModel(
        ModelConfig(hidden1=8, hidden2=4, dropout=0.1), device_graph
    )
    cfg = TrainConfig(
        batch_size=32, learning_rate=1e-3, num_epochs=1, scan_chunk=8
    )
    seen = []
    trainer = Trainer(
        model, graph, splits, device_graph, cfg, seed=1,
        iteration_hook=lambda t, r: seen.append(r),
    )
    trainer.train()
    assert trainer.global_step == len(seen) > 0
    assert all(np.isfinite(r.loss) for r in seen)
    assert [r.iteration for r in seen] == list(range(len(seen)))


def test_apk_matches_reference_semantics():
    # Hand-checked examples of the reference apk (rank_metrics.py:4-40).
    assert average_precision_at_k([0, 1], [0, 5, 1], k=3) == pytest.approx(
        (1 / 1 + 2 / 3) / 2
    )
    assert average_precision_at_k([], [1, 2], k=5) == 0.0
    assert average_precision_at_k([3], [3], k=5) == 1.0


def test_compute_scores_perfect_separation():
    s = compute_scores(np.array([0.9, 0.8]), np.array([0.2, 0.1]))
    assert s.auroc == 1.0 and s.auprc == 1.0 and s.apk == 1.0


def test_neg_sample_size_fanout(small_world):
    """neg_sample_size > 1 draws that many negatives per positive
    (sampler fan-out, reference optimizer.py:36-49) and still trains."""
    graph, splits, dg = small_world
    from decagon_tpu.models.model import DecagonModel, ModelConfig

    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8), dg)
    cfg = TrainConfig(batch_size=32, learning_rate=1e-2, neg_sample_size=3)
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    losses = [trainer.train_batch(b) for b in trainer.scheduler.epoch()]
    losses = [float(l) for l in losses]
    assert losses and np.all(np.isfinite(losses))
    # Triple fan-out means the hinge sum sees 3x the pairs: the loss
    # scale must exceed the single-negative run's first step.
    cfg1 = TrainConfig(batch_size=32, learning_rate=1e-2, neg_sample_size=1)
    t1 = Trainer(model, graph, splits, dg, cfg1, seed=0)
    first1 = float(t1.train_batch(next(iter(t1.scheduler.epoch()))))
    assert losses[0] > first1


def test_balanced_schedule_exact_coverage():
    """schedule='balanced': one epoch visits EVERY train edge of every
    relation (full batches + one wrap-padded tail batch; tiny relations
    wrap-pad to one batch), count matches num_batches_per_epoch."""
    from collections import Counter

    import numpy as np

    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.train.sampler import MinibatchScheduler

    graph = make_synthetic_graph(
        n_genes=120, n_drugs=80, n_drugdrug_types=3, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.0, seed=1)
    sch = MinibatchScheduler(
        graph, splits, batch_size=64, seed=5, schedule="balanced"
    )
    for _ in range(2):  # two epochs: coverage must repeat
        batches = list(sch.epoch())
        assert len(batches) == sch.num_batches_per_epoch()
        per_rel = Counter((b.edge_type, b.k) for b in batches)
        seen = {}
        for b in batches:
            seen.setdefault((b.edge_type, b.k), set()).update(
                zip(b.rows.tolist(), b.cols.tolist())
            )
        for key in graph.relation_keys():
            n = splits[key].train.shape[0]
            want = -(-n // 64) if n else 0
            assert per_rel[(key[:2], key[2])] == want, key
            if n:
                # every train edge visited at least once per epoch
                edges = set(map(tuple, splits[key].train.tolist()))
                assert edges <= seen[(key[:2], key[2])], key


def test_grouped_step_trains_and_counts_steps():
    """relation_group=G: G scheduler batches per optimization step, one
    loss per slot, finite and decreasing overall; global_step counts
    batches."""
    import numpy as np

    from decagon_tpu.graph.device import build_device_graph
    from decagon_tpu.graph.split import split_graph
    from decagon_tpu.graph.synthetic import make_synthetic_graph
    from decagon_tpu.models.model import DecagonModel, ModelConfig
    from decagon_tpu.train.step import TrainConfig
    from decagon_tpu.train.trainer import Trainer

    graph = make_synthetic_graph(
        n_genes=100, n_drugs=60, n_drugdrug_types=2, seed=0
    )
    splits = split_graph(graph, val_frac=0.1, test_frac=0.0, seed=1)
    dg = build_device_graph(graph, splits, edge_pad_multiple=128)
    model = DecagonModel(ModelConfig(hidden1=16, hidden2=8), dg)
    cfg = TrainConfig(
        batch_size=64, learning_rate=1e-3, scan_chunk=4,
        schedule="balanced", relation_group=3, num_epochs=1,
    )
    trainer = Trainer(model, graph, splits, dg, cfg, seed=0)
    losses = []
    trainer.iteration_hook = lambda t, r: losses.append(r.loss)
    trainer.train(num_epochs=4)
    n_batches = trainer.scheduler.num_batches_per_epoch()
    assert trainer.global_step == 4 * n_batches
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
