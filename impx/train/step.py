"""The jit-sharded training step.

Replaces the reference's per-rank forward/backward + DDP all-reduce
(trainer.py:104-164): one jit program over a data mesh computes the loss, the
gradient (psum-reduced by XLA across the mesh), the optimizer update, and the
reference's manual exponential LR decay (trainer.py:168-172:
lr = lr0 * decay_rate^(it - decay_iter), clamped to [min_lr, lr0]).

NaN/Inf guard (trainer.py:119-150): instead of the host-side skip-batch logic,
the step zeroes non-finite gradients *inside* jit and reports a `bad_loss`
flag the trainer counts — no host sync in the hot loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainHyperParams:
    lr: float = 1e-4
    min_lr: float = 1e-6
    decay_rate: float = 0.999992
    decay_iter: int = 200_000
    optim: str = "adam"  # adam | adamw
    weight_decay: float = 5e-4
    grad_clip: float = 0.0


def lr_at(hp: TrainHyperParams, iteration):
    """Reference LR schedule (trainer.py:168-172)."""
    lr = hp.lr * hp.decay_rate ** (iteration - hp.decay_iter)
    lr = jnp.minimum(lr, hp.lr)
    return jnp.maximum(lr, hp.min_lr)


def make_optimizer(hp: TrainHyperParams) -> optax.GradientTransformation:
    chain = []
    if hp.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(hp.grad_clip))
    if hp.optim == "adamw":
        chain.append(optax.scale_by_adam())
        chain.append(optax.add_decayed_weights(hp.weight_decay))
    else:
        chain.append(optax.scale_by_adam())
    # LR is injected per-step (inject_hyperparams makes it a state field)
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


def init_stats() -> dict[str, jax.Array]:
    """Device-resident running stats threaded through the step so the trainer
    never has to sync per step (it syncs once per log interval)."""
    z = jnp.zeros((), jnp.float32)
    return {"loss_sum": z, "n_good": z, "consec_bad": z, "max_consec_bad": z}


def make_train_step(model, hp: TrainHyperParams, donate: bool = True) -> Callable:
    """Returns step(params, opt_state, iteration, batch, stats) ->
    (params, opt_state, metrics, stats). jit with donated params/opt_state;
    shard the batch's leading axis over the mesh and XLA inserts the gradient
    psum.

    NaN guard: on a non-finite loss the ENTIRE update is skipped — params and
    optimizer state pass through unchanged (the reference skips
    optimizer.step(), trainer.py:119-150; merely zeroing grads would still
    move Adam's momentum). The running `stats` count good losses and
    consecutive bad steps in-jit so the trainer's hot loop stays sync-free."""
    tx = make_optimizer(hp)

    def loss_fn(params, batch):
        out = model.forward_train(params, batch, train=True)
        return out["loss"], out

    def step(params, opt_state, iteration, batch, stats):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        bad = ~jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(bad, jnp.zeros_like(g), g), grads)
        lr = lr_at(hp, iteration)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        # skip the whole update on a bad loss (reference trainer.py:119-150)
        params = jax.tree.map(lambda o, n: jnp.where(bad, o, n), params, new_params)
        opt_state = jax.tree.map(
            lambda o, n: jnp.where(bad, o, n) if hasattr(n, "dtype") else n,
            opt_state, new_opt_state)
        badf = bad.astype(jnp.float32)
        consec = jnp.where(bad, stats["consec_bad"] + 1.0, 0.0)
        stats = {
            "loss_sum": stats["loss_sum"] + jnp.where(bad, 0.0, loss),
            "n_good": stats["n_good"] + (1.0 - badf),
            "consec_bad": consec,
            "max_consec_bad": jnp.maximum(stats["max_consec_bad"], consec),
        }
        metrics = {
            "loss": loss,
            "matching_loss": out.get("matching_loss", loss),
            "acc_corr": out.get("acc_corr", jnp.zeros(())),
            "acc_incorr": out.get("acc_incorr", jnp.zeros(())),
            "total_acc_corr": out.get("total_acc_corr", jnp.ones(())),
            "total_acc_incorr": out.get("total_acc_incorr", jnp.ones(())),
            "geo_loss": out.get("geo_loss", jnp.zeros(())),
            "max_mscore": jnp.max(out.get("matching_scores0", jnp.zeros((1,)))),
            "lr": lr,
            "bad_loss": bad.astype(jnp.int32),
        }
        return params, opt_state, metrics, stats

    # stats are 4 scalars — not worth donating (and init_stats' identical
    # zeros can alias one buffer, which donation rejects)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
