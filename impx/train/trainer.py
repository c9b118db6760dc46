"""Training loop: epochs, metrics, checkpoints, in-training eval.

Mirrors reference trainer.py semantics:
  * manual exponential LR decay handled inside the jit step (step.py);
  * NaN/Inf guard: skip bad batches, abort the epoch after 10 in a row
    (trainer.py:119-150) — here the flag comes back from the device step;
  * per-epoch checkpointing + best-checkpoint tracking (trainer.py:269-291;
    the reference's best-comparison is inverted for eval metrics — fixed here:
    higher eval value == better);
  * run dir named from timestamp + hyperparams (trainer.py:56-61);
  * metrics to console, log.txt and TensorBoard (trainer.py:174-202);
  * dataset resampled every epoch with seed=epoch (trainer.py:295).

Checkpoints are orbax (params + opt state + step — the reference loses
optimizer state on resume, trainer.py:42-54; we don't).
"""
from __future__ import annotations

import datetime
import json
import os
import os.path as osp
import time
from typing import Any, Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp

from impx.train.step import TrainHyperParams, make_train_step, make_optimizer
from impx.parallel.mesh import make_mesh, shard_batch, replicate


class MetricWriter:
    """Console + log.txt + jsonl (+ TensorBoard when available)."""

    def __init__(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        self.log_file = open(osp.join(save_dir, "log.txt"), "a+")
        self.jsonl = open(osp.join(save_dir, "metrics.jsonl"), "a+")
        self.tb = None
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(save_dir)
        except Exception:
            pass

    def write(self, step: int, metrics: dict[str, float], prefix: str = ""):
        payload = {"step": step, **{prefix + k: float(v) for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(payload) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(prefix + k, float(v), global_step=step)

    def text(self, msg: str):
        print(msg)
        self.log_file.write(msg + "\n")
        self.log_file.flush()

    def close(self):
        self.log_file.close()
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class Trainer:
    def __init__(
        self,
        model,
        dataset,
        args: Any,
        eval_fn: Callable | None = None,
        mesh=None,
    ):
        """dataset: object with __len__/__getitem__ returning training dicts and
        a build_dataset(seed) resample hook (duck-typed to the reference's
        Megadepth); eval_fn(params) -> dict of scalars (higher better)."""
        self.model = model
        self.dataset = dataset
        self.args = args
        self.eval_fn = eval_fn
        mp = int(getattr(args, "model_parallel", 1) or 1)
        if mesh is not None:
            self.mesh = mesh
        elif mp > 1:
            # 2-D (data, model) mesh: Megatron-style tensor parallelism
            # (impx/parallel/tp.py) on top of data parallelism
            import jax

            from impx.parallel.tp import make_2d_mesh

            n_dev = len(jax.devices())
            if n_dev % mp:
                raise SystemExit(f"--model_parallel {mp} does not divide the "
                                 f"{n_dev} local devices")
            self.mesh = make_2d_mesh(n_dev // mp, mp)
        else:
            self.mesh = make_mesh()
        self.tensor_parallel = "model" in self.mesh.axis_names

        self.hp = TrainHyperParams(
            lr=args.lr, min_lr=getattr(args, "min_lr", 1e-6),
            decay_rate=getattr(args, "decay_rate", 0.999992),
            decay_iter=getattr(args, "decay_iter", 200_000),
            optim=getattr(args, "optim", "adam"),
            weight_decay=getattr(args, "weight_decay", 5e-4),
        )
        self.step_fn = make_train_step(model, self.hp)
        self.tx = make_optimizer(self.hp)

        now = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        tag = (f"{now}_{args.network}_L{model.config.n_layers}_{args.feature}"
               f"_B{args.batch_size}_K{getattr(args, 'max_keypoints', 0)}"
               f"_M{model.config.match_threshold}_{model.config.ac_fn}"
               f"_{model.config.norm_fn}_{self.hp.optim}")
        self.save_dir = osp.join(args.save_path, tag)
        self.tag = tag
        self.writer = MetricWriter(self.save_dir)
        with open(osp.join(self.save_dir, "args.json"), "w") as f:
            json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)

        self.iteration = 0
        self.epoch = 0
        self.best_value = -np.inf

        # preemption-safe checkpointing: on SIGTERM (cloud preemption notice)
        # set a flag; the epoch loop checkpoints to {tag}.preempt at the next
        # log boundary and exits cleanly. Flag-based so the signal handler
        # never touches jax state. Installed only in the main thread (signal
        # module requirement); Trainer built in a worker thread skips it.
        self._preempted = False
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            self._prev_sigterm = signal.signal(
                signal.SIGTERM, lambda *_: setattr(self, "_preempted", True))

    # ------------------------------------------------------------- checkpoints
    def save_checkpoint(self, params, opt_state, name: str | None = None):
        import orbax.checkpoint as ocp

        name = name or f"{self.args.network}.{self.epoch:02d}"
        path = osp.abspath(osp.join(self.save_dir, name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "params": params,
            "opt_state": opt_state,
            "meta": {"epoch": self.epoch, "iteration": self.iteration,
                     "best_value": self.best_value},
        }, force=True)
        ckptr.wait_until_finished()
        return path

    def restore_checkpoint(self, path: str, params, opt_state):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"params": params, "opt_state": opt_state,
                  "meta": {"epoch": 0, "iteration": 0, "best_value": 0.0}}
        restored = ckptr.restore(osp.abspath(path), target)
        self.epoch = int(restored["meta"]["epoch"]) + 1
        self.iteration = int(restored["meta"]["iteration"])
        self.best_value = float(restored["meta"]["best_value"])
        return restored["params"], restored["opt_state"]

    # ------------------------------------------------------------------ epochs
    def _batches_sync(self) -> Iterable[dict]:
        bs = self.args.batch_size
        idx = 0
        n = len(self.dataset)
        while idx + bs <= n:
            samples = [self.dataset[i] for i in range(idx, idx + bs)]
            batch = {
                k: np.stack([s[k] for s in samples]).astype(np.float32)
                for k in samples[0]
                if isinstance(samples[0][k], np.ndarray)
            }
            yield shard_batch(self.mesh, batch)
            idx += bs

    def _batches(self) -> Iterable[dict]:
        """Background-thread prefetch (depth 2) so host-side batch assembly
        overlaps the device step — the reference uses DataLoader workers for
        the same reason (train.py:87)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()

        def producer():
            try:
                for batch in self._batches_sync():
                    q.put(batch)
                q.put(sentinel)
            except BaseException as e:  # re-raised on the consumer side —
                q.put(e)                # a dead producer must not look like
                                        # a clean end-of-epoch

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def process_epoch(self, params, opt_state):
        """Hot loop is host-sync-free: per-step metrics and the NaN-guard
        counters accumulate ON DEVICE (impx/train/step.py:init_stats) and the
        host reads them back only once per `log_intervals` steps, so step
        dispatch stays asynchronous and the prefetch queue actually overlaps.
        Consequence vs the reference's per-batch check (trainer.py:119-150):
        the 10-consecutive-NaN abort fires at the next log boundary (bad steps
        are no-op updates in between), up to log_intervals-1 steps late."""
        from impx.train.step import init_stats

        its_per_epoch = getattr(self.args, "its_per_epoch", -1)
        log_intervals = getattr(self.args, "log_intervals", 50)
        stats = init_stats()
        loss_sum, n_good = 0.0, 0

        def sync_interval(metrics, stats):
            """One host sync: returns (interval mean loss, good count,
            max consecutive bad) and logs."""
            s = {k: float(v) for k, v in stats.items()}
            mean_loss = s["loss_sum"] / max(s["n_good"], 1.0)
            acc_c = float(metrics["acc_corr"])
            acc_i = float(metrics["acc_incorr"])
            self.writer.text(
                f"Epoch [{self.epoch}/{self.args.epochs}] Step [{bidx}/{self.iteration}] "
                f"Loss [{mean_loss:.3f}] MS [{float(metrics['max_mscore']):.2f}] "
                f"Acc [c{acc_c:.1f} n{acc_i:.1f}] lr {float(metrics['lr']):.2e}")
            self.writer.write(self.iteration, {
                "interval_mean_loss": mean_loss,
                **{k: float(v) for k, v in metrics.items() if k != "bad_loss"}})
            return mean_loss, s["n_good"], s["max_consec_bad"]

        metrics = None
        for bidx, batch in enumerate(self._batches()):
            if 0 <= its_per_epoch <= bidx:
                break
            if self._preempted:  # SIGTERM: stop dispatching, save + exit
                break
            params, opt_state, metrics, stats = self.step_fn(
                params, opt_state, jnp.asarray(self.iteration), batch, stats)
            self.iteration += 1

            if (bidx + 1) % log_intervals == 0:
                mean_loss, good, max_bad = sync_interval(metrics, stats)
                if max_bad >= 10:
                    self.writer.text(
                        "Abort epoch: >=10 consecutive INF/NAN losses")
                    return params, opt_state, None
                if max_bad > 0:
                    self.writer.text(
                        f"Loss was INF/NAN on {log_intervals - int(good)} "
                        f"steps this interval (max consecutive {int(max_bad)})")
                loss_sum += mean_loss * good
                n_good += good
                # reset interval accumulators but CARRY the consecutive-bad
                # counter: a NaN run spanning an interval boundary must still
                # trip the 10-strike abort (reference trainer.py:119-150)
                carry_bad = stats["consec_bad"]
                stats = init_stats()
                stats["consec_bad"] = carry_bad
                stats["max_consec_bad"] = carry_bad

        if metrics is not None:  # tail flush
            s = {k: float(v) for k, v in stats.items()}
            # abort check must NOT be gated on n_good: a NaN run confined to
            # an all-bad tail (zero good tail steps) still has to abort
            if s["max_consec_bad"] >= 10:
                self.writer.text("Abort epoch: >=10 consecutive INF/NAN losses")
                return params, opt_state, None
            if s["n_good"] > 0:
                loss_sum += s["loss_sum"]
                n_good += s["n_good"]
        return params, opt_state, (loss_sum / n_good if n_good else None)

    def train(self, params, opt_state=None):
        # the global batch shards over the data axis (reference train.py:86
        # splits batch_size across ranks the same way); an indivisible batch
        # would otherwise fail inside the prefetch thread with an opaque XLA
        # sharding error after the run directory is already created
        n_data = self.mesh.shape["data"]
        if int(self.args.batch_size) % n_data:
            raise SystemExit(
                f"batch_size={self.args.batch_size} must be divisible by the "
                f"data-parallel axis ({n_data} devices)")
        if self.tensor_parallel:
            from impx.parallel.tp import shard_params_tp

            params = shard_params_tp(self.mesh, params)
            if opt_state is None:
                opt_state = self.tx.init(params)  # moments inherit shardings
            else:
                # resumed host-side state: place every leaf like a fresh init
                import jax

                template = self.tx.init(params)
                opt_state = jax.tree.map(
                    lambda t, x: jax.device_put(x, t.sharding),
                    template, opt_state)
        else:
            if opt_state is None:
                opt_state = self.tx.init(params)
            params = replicate(self.mesh, params)
            opt_state = replicate(self.mesh, opt_state)

        while self.epoch < self.args.epochs:
            t0 = time.time()
            params, opt_state, train_loss = self.process_epoch(params, opt_state)
            if self._preempted:
                # preemption: persist params+opt_state+step mid-epoch and
                # exit cleanly; restore_checkpoint resumes from here
                path = self.save_checkpoint(params, opt_state,
                                            name=f"{self.tag}.preempt")
                self.writer.text(f"SIGTERM: preemption checkpoint -> {path}")
                return params, opt_state
            if train_loss is None:  # INF/NAN abort -> retry epoch (trainer.py:256-259)
                continue

            if self.eval_fn is not None and self.epoch % 5 == 0:
                eval_out = self.eval_fn(params)
                self.writer.write(self.iteration, eval_out, prefix="eval_")
                value = eval_out.get("prec", -train_loss)
            else:
                value = -train_loss

            path = self.save_checkpoint(params, opt_state)
            if value > self.best_value:  # higher is better (reference bug fixed)
                self.best_value = value
                self.save_checkpoint(params, opt_state, name=f"{self.tag}.best")
            self.writer.text(
                f"Epoch {self.epoch}: loss {train_loss:.4f} value {value:.4f} "
                f"({time.time() - t0:.1f}s) -> {path}")

            self.epoch += 1
            if hasattr(self.dataset, "build_dataset"):
                self.dataset.build_dataset(seed=self.epoch)
        return params, opt_state
