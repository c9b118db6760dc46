"""End-to-end training: the matcher must actually LEARN on synthetic scenes
(loss drops, match accuracy rises), the step must run sharded over the 8-device
CPU mesh, and checkpoint save/restore must round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, GM, DGNNS
from impx.data.megadepth import SyntheticMegadepth
from impx.parallel.mesh import make_mesh, shard_batch, replicate
from impx.train.step import (TrainHyperParams, make_train_step, make_optimizer,
                             lr_at, init_stats)


def _tiny_model(network="gm", n_layers=2, dim=32):
    cfg = MatcherConfig(descriptor_dim=dim, keypoint_encoder=(16, 32), n_layers=n_layers,
                        sinkhorn_iterations=10, norm_fn="in", n_min_tokens=8)
    return (GM if network == "gm" else DGNNS)(cfg)


def _batch(rs, n, nfeat=32, dim=32):
    ds = SyntheticMegadepth(num_pairs=n, nfeatures=nfeat, desc_dim=dim, seed=0)
    samples = [ds[i] for i in range(n)]
    return {
        k: np.stack([s[k] for s in samples]).astype(np.float32)
        for k in samples[0] if isinstance(samples[0][k], np.ndarray)
    }


def test_training_learns():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    hp = TrainHyperParams(lr=3e-4, decay_iter=10_000)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    rs = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in _batch(rs, 8).items()}

    losses = []
    accs = []
    for it in range(60):
        params, opt_state, metrics, _ = step(params, opt_state, jnp.asarray(it),
                                             batch, init_stats())
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["acc_corr"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert accs[-1] > accs[0] + 1.0, (accs[0], accs[-1])  # matches found per pair


def test_training_step_sharded_8dev():
    """The same step over an 8-device data mesh: runs, finite, and equals the
    single-device step numerically (psum-of-mean == global mean)."""
    model = _tiny_model("dgnns")
    params = model.init(jax.random.PRNGKey(1))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    batch_np = _batch(np.random.RandomState(1), 8)
    # single device
    p1, _, m1, _ = step(params, opt_state, jnp.asarray(0),
                        {k: jnp.asarray(v) for k, v in batch_np.items()},
                        init_stats())

    mesh = make_mesh()
    assert mesh.devices.size == 8
    with mesh:
        p_r = replicate(mesh, params)
        o_r = replicate(mesh, opt_state)
        sharded = shard_batch(mesh, batch_np)
        p2, _, m2, _ = step(p_r, o_r, jnp.asarray(0), sharded, init_stats())
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    # updated params agree between replicated-sharded and single-device
    l1 = jax.tree.leaves(p1)
    l2 = jax.tree.leaves(p2)
    for a, b in zip(l1, l2):
        # adam's first-step update is ~sign(g)*lr; cross-device reduction
        # order can flip near-zero gradients, so compare with atol ~ lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)  # sign flip bounds |diff| by 2*lr


def test_bn_training_step_sharded_8dev():
    """SyncBatchNorm semantics (reference train.py:81): with norm_fn='bn' the
    batch moments must be computed over the GLOBAL batch even when it is
    sharded over 8 devices — the sharded step must match the single-device
    step, which is only true if XLA all-reduces the BN statistics."""
    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32), n_layers=2,
                        sinkhorn_iterations=10, norm_fn="bn", n_min_tokens=8)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(5))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    batch_np = _batch(np.random.RandomState(5), 8)
    p1, _, m1, _ = step(params, opt_state, jnp.asarray(0),
                        {k: jnp.asarray(v) for k, v in batch_np.items()},
                        init_stats())

    mesh = make_mesh()
    assert mesh.devices.size == 8
    with mesh:
        p_r = replicate(mesh, params)
        o_r = replicate(mesh, opt_state)
        sharded = shard_batch(mesh, batch_np)
        p2, _, m2, _ = step(p_r, o_r, jnp.asarray(0), sharded, init_stats())
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_bn_per_shard_stats_differ_from_global():
    """Sanity check that the above test has teeth: per-shard (unsynced) BN on
    one device's slice differs from global-batch BN on that slice."""
    from impx.ops.norms import batch_norm_train

    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(8, 16, 32).astype(np.float32))
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    y_global, _, _ = batch_norm_train(x, scale, bias)
    y_local, _, _ = batch_norm_train(x[:1], scale, bias)
    assert not np.allclose(np.asarray(y_global)[:1], np.asarray(y_local),
                           atol=1e-4)


def test_nan_guard():
    """A poisoned batch must set bad_loss and leave params unchanged."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(2))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)
    opt_state = make_optimizer(hp).init(params)

    batch = {k: jnp.asarray(v) for k, v in _batch(np.random.RandomState(2), 2).items()}
    bad = dict(batch, descriptors0=batch["descriptors0"] * jnp.nan)
    p2, _, metrics, stats = step(params, opt_state, jnp.asarray(0), bad,
                                 init_stats())
    assert int(metrics["bad_loss"]) == 1
    assert float(stats["consec_bad"]) == 1.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_matches_reference():
    """lr = min(lr0 * decay^(it - decay_iter), lr0) clamped at min_lr
    (reference trainer.py:168-172)."""
    hp = TrainHyperParams(lr=1e-4, min_lr=1e-6, decay_rate=0.999992, decay_iter=200_000)
    for it in [0, 100, 200_000, 250_000, 2_000_000]:
        expected = min(1e-4 * 0.999992 ** (it - 200_000), 1e-4)
        expected = max(expected, 1e-6)
        np.testing.assert_allclose(float(lr_at(hp, it)), expected, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    import argparse

    from impx.train.trainer import Trainer

    model = _tiny_model()
    ds = SyntheticMegadepth(num_pairs=4, nfeatures=32, desc_dim=32)
    args = argparse.Namespace(
        lr=1e-4, network="gm", feature="spp", batch_size=2, epochs=1,
        save_path=str(tmp_path), max_keypoints=32)
    trainer = Trainer(model, ds, args)
    params = model.init(jax.random.PRNGKey(3))
    opt_state = trainer.tx.init(params)
    trainer.epoch = 7
    trainer.iteration = 123
    path = trainer.save_checkpoint(params, opt_state, name="test_ckpt")

    trainer2 = Trainer(model, ds, args)
    p2 = jax.tree.map(jnp.zeros_like, params)
    o2 = trainer2.tx.init(p2)
    p2, o2 = trainer2.restore_checkpoint(path, p2, o2)
    assert trainer2.epoch == 8 and trainer2.iteration == 123
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_abort_spans_log_intervals(tmp_path):
    """The 10-consecutive-NaN epoch abort must count ACROSS log-interval
    boundaries (reference trainer.py:119-150 counts per step): with
    log_intervals=3 a permanently-poisoned dataset still aborts the epoch."""
    import argparse

    from impx.train.trainer import Trainer

    class PoisonedDataset(SyntheticMegadepth):
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            s["descriptors0"] = s["descriptors0"] * np.nan
            return s

    model = _tiny_model()
    ds = PoisonedDataset(num_pairs=256, nfeatures=32, desc_dim=32)
    args = argparse.Namespace(
        lr=1e-4, network="gm", feature="spp", batch_size=8, epochs=1,
        save_path=str(tmp_path), max_keypoints=32, its_per_epoch=20,
        log_intervals=3)
    trainer = Trainer(model, ds, args)
    params = model.init(jax.random.PRNGKey(4))
    opt_state = trainer.tx.init(params)
    params = replicate(trainer.mesh, params)
    opt_state = replicate(trainer.mesh, opt_state)
    _, _, epoch_loss = trainer.process_epoch(params, opt_state)
    assert epoch_loss is None  # aborted, not ground through all 20 steps
    log = open(f"{trainer.save_dir}/log.txt").read()
    assert "Abort epoch" in log  # the abort fired, not an empty epoch


def test_indivisible_batch_rejected_up_front(tmp_path):
    """batch_size not divisible by the data axis must fail with a clear
    SystemExit at train() entry, not die inside the prefetch thread (which
    used to surface as a silent zero-batch epoch)."""
    import argparse

    import pytest

    from impx.train.trainer import Trainer

    model = _tiny_model()
    ds = SyntheticMegadepth(num_pairs=8, nfeatures=32, desc_dim=32)
    args = argparse.Namespace(
        lr=1e-4, network="gm", feature="spp", batch_size=4, epochs=1,
        save_path=str(tmp_path), max_keypoints=32, its_per_epoch=2)
    trainer = Trainer(model, ds, args)
    assert trainer.mesh.shape["data"] == 8  # conftest's virtual mesh
    with pytest.raises(SystemExit, match="divisible"):
        trainer.train(model.init(jax.random.PRNGKey(0)))


def test_prefetch_thread_exception_propagates(tmp_path):
    """An exception in the prefetch producer thread must surface in
    process_epoch, not be swallowed as a clean end-of-epoch."""
    import argparse

    import pytest

    from impx.train.trainer import Trainer

    class ExplodingDataset(SyntheticMegadepth):
        def __getitem__(self, idx):
            raise RuntimeError("boom in the data pipeline")

    model = _tiny_model()
    ds = ExplodingDataset(num_pairs=8, nfeatures=32, desc_dim=32)
    args = argparse.Namespace(
        lr=1e-4, network="gm", feature="spp", batch_size=8, epochs=1,
        save_path=str(tmp_path), max_keypoints=32, its_per_epoch=2)
    trainer = Trainer(model, ds, args)
    params = replicate(trainer.mesh, model.init(jax.random.PRNGKey(0)))
    opt_state = replicate(trainer.mesh, trainer.tx.init(params))
    with pytest.raises(RuntimeError, match="boom"):
        trainer.process_epoch(params, opt_state)


def test_preemption_checkpoint(tmp_path):
    """SIGTERM-flagged preemption: train() stops dispatching, writes a
    {tag}.preempt orbax checkpoint mid-epoch and returns cleanly; the
    handler is installed for real SIGTERM delivery."""
    import argparse
    import glob
    import os
    import signal

    from impx.train.trainer import Trainer

    model = _tiny_model()
    ds = SyntheticMegadepth(num_pairs=64, nfeatures=32, desc_dim=32)
    args = argparse.Namespace(
        lr=1e-4, network="gm", feature="spp", batch_size=8, epochs=3,
        save_path=str(tmp_path), max_keypoints=32, its_per_epoch=1000,
        log_intervals=2)
    trainer = Trainer(model, ds, args)
    try:
        handler = signal.getsignal(signal.SIGTERM)
        assert callable(handler)  # installed by Trainer (main thread)
        handler(signal.SIGTERM, None)  # deliver the preemption notice
        assert trainer._preempted

        params = model.init(jax.random.PRNGKey(5))
        params, opt_state = trainer.train(params)  # returns without 3 epochs
        preempt = glob.glob(os.path.join(trainer.save_dir, "*.preempt"))
        assert len(preempt) == 1

        # resume from the preemption checkpoint
        trainer2 = Trainer(model, ds, args)
        p2 = jax.tree.map(jnp.zeros_like, model.init(jax.random.PRNGKey(5)))
        p2, _ = trainer2.restore_checkpoint(preempt[0], p2, trainer2.tx.init(p2))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        signal.signal(signal.SIGTERM, trainer._prev_sigterm)
