"""Tensor parallelism (2-D data x model mesh, impx/parallel/tp.py).

The reference has no model parallelism (SURVEY §2.7: DP only); these tests
prove the framework's TP option is numerically exact — the Megatron-style
parameter shardings (column-parallel q/k/v + row-parallel merge, alternating
MLP chains) must reproduce the single-device forward and train step bit-for-
tolerance on the 8-device virtual CPU mesh, for both mesh shapes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from impx.models import MatcherConfig, DGNNS
from impx.data.megadepth import SyntheticMegadepth
from impx.parallel.mesh import shard_batch
from impx.parallel.tp import (make_2d_mesh, matcher_param_specs,
                              shard_params_tp)
from impx.train.step import (TrainHyperParams, make_train_step,
                             make_optimizer, init_stats)


def _model(n_layers=3, dim=32):
    cfg = MatcherConfig(descriptor_dim=dim, keypoint_encoder=(16, 32),
                        n_layers=n_layers, sinkhorn_iterations=10,
                        norm_fn="in", n_min_tokens=8)
    return DGNNS(cfg)


def _batch(n, nfeat=32, dim=32, seed=0):
    ds = SyntheticMegadepth(num_pairs=n, nfeatures=nfeat, desc_dim=dim,
                            seed=seed)
    samples = [ds[i] for i in range(n)]
    return {k: np.stack([s[k] for s in samples]).astype(np.float32)
            for k in samples[0] if isinstance(samples[0][k], np.ndarray)}


def test_param_specs_cover_tree():
    """The spec tree mirrors the param tree exactly and shards every big
    matmul: all attention projections and all MLP hidden layers carry the
    model axis."""
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    specs = matcher_param_specs(params)
    # same structure (tree.map would raise otherwise)
    jax.tree.map(lambda x, s: None, params, specs)
    flat = {jax.tree_util.keystr(p): s
            for p, s in jax.tree_util.tree_leaves_with_path(specs)}
    for path, spec in flat.items():
        if "['attn']" in path and path.endswith("['w']"):
            assert "model" in str(spec), (path, spec)
        if "['mlp'][0]['w']" in path:
            assert spec == jax.sharding.PartitionSpec(None, "model"), path
    assert flat["['bin_score']"] == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_tp_forward_matches_single_device(mesh_shape):
    model = _model()
    params = model.init(jax.random.PRNGKey(1))
    batch_np = _batch(4)
    feed = {k: jnp.asarray(v) for k, v in batch_np.items()}

    fwd = jax.jit(lambda p, d: model.produce_matches(p, d, p=0.2,
                                                     only_last=True))
    ref = fwd(params, feed)

    mesh = make_2d_mesh(*mesh_shape)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        sharded = shard_batch(mesh, batch_np)
        out = fwd(p_tp, sharded)

    np.testing.assert_array_equal(np.asarray(ref["indices0"]),
                                  np.asarray(out["indices0"]))
    np.testing.assert_allclose(np.asarray(ref["mscores0"]),
                               np.asarray(out["mscores0"]), atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_tp_train_step_matches_single_device(mesh_shape):
    """One fwd+bwd+adam step with TP-sharded params == the single-device step
    (the gradient of a sharded matmul psums over `model`; adam moments
    inherit the param shardings through zeros_like)."""
    model = _model()
    params = model.init(jax.random.PRNGKey(2))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)

    batch_np = _batch(8, seed=2)
    opt_state = make_optimizer(hp).init(params)
    p1, _, m1, _ = step(params, opt_state, jnp.asarray(0),
                        {k: jnp.asarray(v) for k, v in batch_np.items()},
                        init_stats())

    mesh = make_2d_mesh(*mesh_shape)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        o_tp = make_optimizer(hp).init(p_tp)
        sharded = shard_batch(mesh, batch_np)
        p2, _, m2, _ = step(p_tp, o_tp, jnp.asarray(0), sharded, init_stats())

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        # reduction-order sign flips near zero gradient bound |diff| by 2*lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sp_forward_matches_single_device(mesh_shape):
    """Sequence parallelism: inputs sharded on the KEYPOINT axis (params
    replicated) must reproduce the single-device forward exactly — GSPMD
    gathers the key sets where attention/Sinkhorn need them."""
    from impx.parallel.tp import shard_batch_sp

    model = _model()
    params = model.init(jax.random.PRNGKey(4))
    batch_np = _batch(4, seed=4)
    feed = {k: jnp.asarray(v) for k, v in batch_np.items()}

    fwd = jax.jit(lambda p, d: model.produce_matches(p, d, p=0.2,
                                                     only_last=True))
    ref = fwd(params, feed)

    mesh = make_2d_mesh(*mesh_shape)
    with mesh:
        sharded = shard_batch_sp(mesh, batch_np)
        out = fwd(params, sharded)

    np.testing.assert_array_equal(np.asarray(ref["indices0"]),
                                  np.asarray(out["indices0"]))
    np.testing.assert_allclose(np.asarray(ref["mscores0"]),
                               np.asarray(out["mscores0"]), atol=1e-5)


def test_sp_train_step_matches_single_device():
    from impx.parallel.tp import shard_batch_sp

    model = _model()
    params = model.init(jax.random.PRNGKey(6))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)

    batch_np = _batch(8, seed=6)
    opt_state = make_optimizer(hp).init(params)
    p1, _, m1, _ = step(params, opt_state, jnp.asarray(0),
                        {k: jnp.asarray(v) for k, v in batch_np.items()},
                        init_stats())

    mesh = make_2d_mesh(2, 4)
    with mesh:
        o2 = make_optimizer(hp).init(params)
        sharded = shard_batch_sp(mesh, batch_np)
        p2, _, m2, _ = step(params, o2, jnp.asarray(0), sharded, init_stats())

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_tp_train_step_bn_matches_single_device():
    """TP with norm_fn='bn': the column-parallel hidden blocks carry
    channel-sharded bn params; batch statistics stay per-channel so the
    sharded step must still equal single-device numerics (and the global
    batch stats must ride the data axis like SyncBatchNorm)."""
    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                        n_layers=2, sinkhorn_iterations=10, norm_fn="bn",
                        n_min_tokens=8)
    model = DGNNS(cfg)
    params = model.init(jax.random.PRNGKey(8))
    hp = TrainHyperParams(lr=1e-4)
    step = make_train_step(model, hp, donate=False)

    batch_np = _batch(8, seed=8)
    opt_state = make_optimizer(hp).init(params)
    p1, _, m1, _ = step(params, opt_state, jnp.asarray(0),
                        {k: jnp.asarray(v) for k, v in batch_np.items()},
                        init_stats())

    mesh = make_2d_mesh(4, 2)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        o_tp = make_optimizer(hp).init(p_tp)
        sharded = shard_batch(mesh, batch_np)
        p2, _, m2, _ = step(p_tp, o_tp, jnp.asarray(0), sharded, init_stats())

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-4)


def test_tp_adagmn_forward_matches_single_device():
    """EIMP adaptive pooling (mass gathers + masks) under tensor-parallel
    params must reproduce the single-device matches."""
    from impx.models import AdaGMN

    cfg = MatcherConfig(descriptor_dim=32, keypoint_encoder=(16, 32),
                        n_layers=3, sinkhorn_iterations=10, norm_fn="in",
                        n_min_tokens=8, first_it_to_update=1)
    model = AdaGMN(cfg)
    params = model.init(jax.random.PRNGKey(9))
    batch_np = _batch(4, seed=9)
    feed = {k: jnp.asarray(v) for k, v in batch_np.items()}

    fwd = jax.jit(lambda p, d: model.produce_matches(p, d, p=0.2,
                                                     only_last=True))
    ref = fwd(params, feed)

    mesh = make_2d_mesh(4, 2)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        sharded = shard_batch(mesh, batch_np)
        out = fwd(p_tp, sharded)

    np.testing.assert_array_equal(np.asarray(ref["indices0"]),
                                  np.asarray(out["indices0"]))


def test_trainer_model_parallel_epoch(tmp_path):
    """Trainer(--model_parallel 2) runs a full epoch on the (4,2) mesh and
    produces the same epoch loss as the plain data-parallel trainer."""
    import argparse

    from impx.data.megadepth import SyntheticMegadepth
    from impx.train.trainer import Trainer

    def run(mp):
        model = _model(n_layers=2)
        ds = SyntheticMegadepth(num_pairs=8, nfeatures=32, desc_dim=32,
                                seed=0)
        args = argparse.Namespace(
            lr=1e-4, network="dgnns", feature="spp", batch_size=8, epochs=1,
            save_path=str(tmp_path), max_keypoints=32, its_per_epoch=-1,
            log_intervals=1, model_parallel=mp)
        trainer = Trainer(model, ds, args)
        if mp > 1:
            assert trainer.tensor_parallel
            assert dict(zip(trainer.mesh.axis_names,
                            trainer.mesh.devices.shape)) == {"data": 4,
                                                             "model": 2}
        params = model.init(jax.random.PRNGKey(7))
        if mp > 1:
            params = shard_params_tp(trainer.mesh, params)
        opt_state = trainer.tx.init(params)
        _, _, loss = trainer.process_epoch(params, opt_state)
        return float(loss)

    l_dp = run(1)
    l_tp = run(2)
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-4)


def test_tp_opt_state_inherits_sharding():
    model = _model()
    params = model.init(jax.random.PRNGKey(3))
    hp = TrainHyperParams()
    mesh = make_2d_mesh(4, 2)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        opt = make_optimizer(hp).init(p_tp)
    # adam's mu for an attention qkv weight must carry the model axis
    mu = opt[0].mu if hasattr(opt[0], "mu") else opt[1].mu
    w_shard = mu["gnn"][0]["attn"]["q"]["w"].sharding
    assert "model" in str(w_shard.spec), w_shard
