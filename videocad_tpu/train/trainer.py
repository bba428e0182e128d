"""Training/evaluation orchestration.

The host-side mirror of the reference Trainer (/root/reference/trainer.py)
around the pure jitted steps: epoch loop with per-epoch reshuffling,
validation cadence, early stopping (loss/accuracy, min/max, patience,
min_delta), JSON metric snapshots in the reference's logs/<experiment>/
layout, Orbax checkpoints with true resume, optional jax.profiler traces,
plus the evaluation suite: teacher-forced evaluate, KV-cached
sequential_evaluate, per-sample CSV dumps, and first-mistake analysis.

Under SPMD there are no ranks: every reduction is inside the compiled step
(psum over the mesh), metric counters arrive already global, and the
early-stop decision is trivially consistent — the reference's
barrier/all_reduce(MIN) choreography (trainer.py:361, 560-563) disappears.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videocad_tpu.actions.ops import apply_action_mask
from videocad_tpu.infer.rollout import sequential_inference
from videocad_tpu.train.checkpoint import CheckpointHandler
from videocad_tpu.train.metrics import init_metrics, update_metrics
from videocad_tpu.train.objective import LossConfig, compute_loss_and_metrics
from videocad_tpu.train.preempt import PreemptionGuard
from videocad_tpu.train.state import create_sharded_train_state, create_train_state
from videocad_tpu.train.steps import make_eval_step, make_train_step
from videocad_tpu.parallel.mesh import shard_batch


def _array_batch(batch: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, (np.ndarray, jnp.ndarray))}


def _numpy_batch(batch: Dict) -> Dict:
    """Array-only view of a host batch, kept as numpy.

    The training hot loop hands batches to ``device_prefetch``, which owns
    device placement (``put_local_shard`` on multi-host meshes). Converting
    to jax arrays here would commit each host's DISTINCT local batch to its
    local devices and bypass the global-batch assembly — the silent
    local-as-global bug on pods — so the conversion must stay numpy-side.
    """
    return {k: np.asarray(v) for k, v in batch.items()
            if isinstance(v, (np.ndarray, jnp.ndarray))}


class MetricsLogger:
    """JSON snapshots under logs/<experiment>/ (reference layout)."""

    def __init__(self, experiment_name: str, log_dir: str = "logs"):
        self.dir = os.path.join(log_dir, experiment_name)
        os.makedirs(self.dir, exist_ok=True)

    def save(self, metrics: Dict, ext: str):
        with open(os.path.join(self.dir, f"{ext}.json"), "w") as f:
            json.dump({k: float(v) if isinstance(v, (int, float, np.floating))
                       else v for k, v in metrics.items()}, f, indent=4)


class Trainer:
    def __init__(self, model, train_pipe, val_pipe, test_pipe,
                 training_config: Dict, loss_config: LossConfig,
                 params=None, mesh=None, rng: Optional[jax.Array] = None,
                 log_dir: str = "logs"):
        self.model = model
        self.train_pipe = train_pipe
        self.val_pipe = val_pipe
        self.test_pipe = test_pipe
        self.config = training_config
        self.loss_config = loss_config
        self.mesh = mesh
        self.rng = rng if rng is not None else jax.random.PRNGKey(
            training_config.get("seed", 0))

        self.experiment_name = training_config.get(
            "experiment_name", f"default_{int(time.time())}")
        self.logger = MetricsLogger(self.experiment_name, log_dir)
        self.checkpoints = CheckpointHandler(
            self.experiment_name, training_config.get("checkpoint_dir",
                                                      "checkpoints"))

        if params is None:
            from videocad_tpu.models.factory import init_model
            params = init_model(model, self.rng, batch=1, seq_len=2)
        freeze_cad = model.config.use_pretrained_cad_model
        if mesh is not None:
            self.state, self.tx = create_sharded_train_state(
                params, training_config, mesh, freeze_cad)
        else:
            self.state, self.tx = create_train_state(
                params, training_config, freeze_cad)

        noise = training_config.get("noise", False)
        step_fn = make_train_step(model, self.tx, loss_config, noise=noise,
                                  dropout_rng_impl=training_config.get(
                                      "dropout_rng_impl", "rbg"))
        if mesh is not None:
            # Pin the DP/TP layout as explicit in/out sharding constraints
            # (the state was created sharded; its leaf shardings ARE the
            # contract) so GSPMD cannot re-layout the optimizer state.
            from videocad_tpu.parallel.mesh import batch_sharding
            from videocad_tpu.train.steps import jit_train_step

            state_shardings = jax.tree_util.tree_map(
                lambda x: x.sharding, self.state)
            self._train_step = jit_train_step(
                step_fn, mesh=mesh, batch_sharding=batch_sharding(mesh),
                state_shardings=state_shardings)
        else:
            self._train_step = jax.jit(step_fn, donate_argnums=(0,))
        self._eval_step = jax.jit(make_eval_step(model, loss_config))
        self._eval_step_ablation = jax.jit(
            make_eval_step(model, loss_config, ablate_cad=True))

        # Early stopping config (reference trainer.py:211-216)
        self.es_enabled = training_config.get("early_stopping_enabled", False)
        self.es_patience = training_config.get("early_stopping_patience", 100)
        self.es_min_delta = training_config.get("early_stopping_min_delta", 0.0)
        self.es_metric = training_config.get("early_stopping_metric", "accuracy")
        self.es_mode = training_config.get("early_stopping_mode", "max")
        self.start_epoch = 0
        # Preemption guard (train/preempt.py): installed by train() when
        # config["preemption_safe"] (default on); _preempted records a
        # mid-epoch consensus stop inside _train_epoch.
        self._guard: Optional[PreemptionGuard] = None
        self._preempted = False

    # ------------------------------------------------------------------
    def log(self, message: str):
        if jax.process_index() == 0:
            print(message)

    def _put(self, batch: Dict) -> Dict:
        arrays = _array_batch(batch)
        if self.mesh is not None:
            return shard_batch(self.mesh, arrays)
        return arrays

    # ------------------------------------------------------------------
    def resume(self, name: Optional[str] = None) -> bool:
        """Restore the latest (or named) checkpoint; True if resumed."""
        name = name or self.checkpoints.latest_epoch()
        if name is None:
            return False
        self.state, meta = self.checkpoints.restore(name, self.state)
        self.start_epoch = int(meta.get("epoch", 0))
        self.log(f"Resumed from {name} at epoch {self.start_epoch}")
        return True

    def train(self, epochs: int):
        best_value = float("inf") if self.es_mode == "min" else float("-inf")
        best_name = None
        patience = 0
        preempted = False
        profiling = self.config.get("enable_profiling", False)
        if self.config.get("preemption_safe", True):
            # SIGTERM (fleet maintenance / spot reclaim) becomes a clean
            # save-and-stop instead of losing work since the last
            # save_frequency checkpoint. Installed only for the duration
            # of train(); previous handlers are restored in the finally.
            self._guard = PreemptionGuard().install()
        try:
            for epoch in range(self.start_epoch, epochs):
                epoch_start = time.time()
                avg_loss, metrics = self._train_epoch(epoch, profiling)
                if self._preempted:
                    # Mid-epoch stop: the epoch is incomplete, so the
                    # checkpoint's meta says "resume AT this epoch"
                    # (restart it), not after it.
                    self.checkpoints.save(self.state, epoch - 1, avg_loss)
                    self.log(f"Preempted during epoch {epoch + 1}; "
                             f"checkpoint saved, resume restarts the epoch")
                    preempted = True
                    break
                self.logger.save(metrics, f"epoch_{epoch + 1}")
                self._log_epoch(epoch, epochs, avg_loss, metrics)

                if (epoch + 1) % self.config.get("save_frequency", 20) == 0:
                    self.checkpoints.save(self.state, epoch, avg_loss)

                val_metrics = self._run_validation(epoch)
                if self._guard is not None and self._guard.consensus():
                    self.checkpoints.save(self.state, epoch, avg_loss)
                    self.log(f"Preempted after epoch {epoch + 1}; "
                             f"checkpoint saved")
                    preempted = True
                    break

                if self.es_enabled:
                    current = self._current_metric(avg_loss, val_metrics)
                    if current is None:
                        pass  # metric not measured this epoch; no ES update
                    elif self._improved(current, best_value):
                        self.log(f"Validation {self.es_metric} improved "
                                 f"{best_value:.4f} -> {current:.4f}")
                        best_value, patience = current, 0
                        self.checkpoints.save(self.state, epoch, avg_loss,
                                              is_best=True)
                        best_name = "best_model"
                    else:
                        patience += 1
                        self.log(f"No improvement; patience "
                                 f"{patience}/{self.es_patience}")
                    if patience >= self.es_patience:
                        self.log(f"Early stopping after {epoch + 1} epochs")
                        break
                self.log(f"Epoch {epoch + 1} took "
                         f"{time.time() - epoch_start:.2f}s")
        finally:
            if self._guard is not None:
                self._guard.uninstall()
                self._guard = None

        # On preemption the best checkpoint may predate the just-saved
        # state; keep the latest weights so resume continues seamlessly.
        if self.es_enabled and best_name and not preempted:
            self.state, _ = self.checkpoints.restore(best_name, self.state)
            self.log("Loaded best model weights")
        self.checkpoints.wait()
        return self.state.params

    def _train_epoch(self, epoch: int, profiling: bool = False):
        """One epoch of fully-async stepping.

        The hot loop performs NO host synchronization: loss and metric
        counters accumulate on device (tiny elementwise adds fused by XLA
        between steps) and are fetched only at ``log_frequency`` boundaries
        and at epoch end. The reference (and round 1) fetched loss +
        metrics every step, serializing host and device and defeating the
        double-buffered prefetch.
        """
        import operator

        from videocad_tpu.data.pipeline import device_prefetch

        log_every = int(self.config.get("log_frequency", 50))
        # Scheduled profiler windows (reference trainer.py:394-439's
        # wait/warmup/active torch.profiler schedule): skip `wait` steps,
        # let `warmup` more compile/settle, then trace `active` steps —
        # usable on long epochs where a whole-epoch trace is not.
        wait = int(self.config.get("profile_wait", 5))
        warmup = int(self.config.get("profile_warmup", 5))
        active = int(self.config.get("profile_active", 15))
        trace_dir = None
        trace_started = trace_done = False
        if profiling:
            try:
                n_total = len(self.train_pipe)
            except TypeError:
                n_total = None
            if n_total is not None and n_total < wait + warmup + active:
                # Epoch shorter than the schedule: fall back to tracing the
                # whole epoch rather than silently capturing nothing.
                wait = warmup = 0
                active = n_total
            trace_dir = os.path.join(self.logger.dir, "profile_traces",
                                     f"epoch{epoch}")
            os.makedirs(trace_dir, exist_ok=True)

        def host_batches():
            # Yield numpy (NOT jax) batches: device placement belongs to
            # device_prefetch, whose put_local_shard assembles the global
            # batch from each host's rows on multi-process meshes.
            for batch in self.train_pipe.epoch(epoch):
                yield _numpy_batch(batch)

        loss_sum = None
        dev_counters = None
        num_batches = 0
        self._preempted = False
        epoch_start = time.time()
        try:
            # Two batches stay in flight on device so step N+1's H2D
            # transfer overlaps step N's compute.
            for device_batch in device_prefetch(host_batches(),
                                                mesh=self.mesh, size=2):
                if (profiling and not trace_done
                        and num_batches == wait + warmup):
                    jax.profiler.start_trace(trace_dir)
                    trace_started = True
                self.state, loss, batch_metrics = self._train_step(
                    self.state, device_batch, self.rng)
                loss_sum = loss if loss_sum is None else loss_sum + loss
                dev_counters = (batch_metrics if dev_counters is None
                                else jax.tree_util.tree_map(
                                    operator.add, dev_counters,
                                    batch_metrics))
                num_batches += 1
                if (trace_started and not trace_done
                        and num_batches >= wait + warmup + active):
                    float(loss_sum)  # reliable device barrier (see bench.py)
                    jax.profiler.stop_trace()
                    trace_started, trace_done = False, True
                    self.log(f"Profiler trace ({active} steps) saved "
                             f"to {trace_dir}")
                if log_every and num_batches % log_every == 0:
                    avg, metrics = self._snapshot(loss_sum, num_batches,
                                                  dev_counters)
                    self._log_batch(epoch, num_batches, avg, metrics,
                                    (time.time() - epoch_start) / num_batches)
                    # Preemption poll: a host-identical program point (the
                    # batch count is the same on every process), so the
                    # consensus collective lines up across the pod.
                    if (self._guard is not None
                            and self._guard.consensus()):
                        self._preempted = True
                        self.log(f"Preemption signal at batch "
                                 f"{num_batches}; stopping epoch")
                        break
        finally:
            if trace_started:
                jax.profiler.stop_trace()
                self.log(f"Profiler trace saved to {trace_dir}")
        if num_batches == 0:
            return 0.0, init_metrics()
        return self._snapshot(loss_sum, num_batches, dev_counters)

    def _snapshot(self, loss_sum, num_batches, dev_counters):
        """Fetch the device-side accumulators once and derive percentages."""
        metrics = init_metrics()
        update_metrics(metrics, jax.device_get(dev_counters))
        return float(loss_sum) / num_batches, metrics

    def _run_validation(self, epoch: int):
        val_metrics = None
        if ((epoch + 1) % self.config.get("seq_val_frequency", 30) == 0
                and self.config.get("sequential", False)):
            val_metrics = self.sequential_evaluate(mode="val")
        if (epoch + 1) % self.config.get("val_frequency", 4) == 0:
            val_metrics = self.evaluate(mode="val", epoch=epoch)
        return val_metrics

    def _current_metric(self, avg_loss, val_metrics):
        """The early-stopping metric for this epoch, or None when the
        configured metric is unavailable (accuracy on a non-validation
        epoch) — mixing in a loss fallback would poison a max-mode best."""
        if self.es_metric == "loss":
            return avg_loss
        if (self.es_metric == "accuracy" and val_metrics
                and val_metrics.get("total_predictions", 0) > 0):
            return (val_metrics["correct_predictions"]
                    / val_metrics["total_predictions"])
        return None

    def _improved(self, current, best):
        if self.es_mode == "min":
            return current < best - self.es_min_delta
        return current > best + self.es_min_delta

    # ------------------------------------------------------------------
    def _loader(self, mode: str):
        mode = mode.replace("_seq", "")
        return {"train": self.train_pipe, "val": self.val_pipe,
                "test": self.test_pipe}[mode]

    def evaluate(self, mode: str = "test", ablation: bool = False,
                 epoch: int = -1) -> Dict:
        metrics = init_metrics()
        step = self._eval_step_ablation if ablation else self._eval_step
        for batch in self._loader(mode).epoch(0):
            _, batch_metrics = step(self.state.params, self._put(batch))
            update_metrics(metrics, jax.device_get(batch_metrics))
        ext = f"{mode}_epoch_{epoch + 1}" if epoch != -1 else mode
        self.logger.save(metrics, ext)
        return metrics

    def sequential_evaluate(self, mode: str = "test",
                            ablation: bool = False) -> Dict:
        """Rollout evaluation over a split via the KV-cached scan decode."""
        metrics = init_metrics()
        for batch in self._loader(mode).epoch(0):
            device_batch = self._put(batch)
            cad = device_batch["cad_image"]
            if ablation:
                cad = jnp.zeros_like(cad)
            # rollout consumes frames[:, :-1] (the model never sees the
            # final frame in teacher forcing either) and predicts 1..T
            preds = sequential_inference(
                self.model, self.state.params,
                device_batch["frames"][:, :-1], cad,
                action=self.model.config.enable_past_actions,
                multiview_images=device_batch.get("multiview_images"))
            _, batch_metrics = compute_loss_and_metrics(
                preds[0], preds[1], device_batch["actions"][:, 1:],
                self.loss_config)
            update_metrics(metrics, jax.device_get(batch_metrics))
        self.logger.save(metrics, f"{mode}_seq")
        return metrics

    # ------------------------------------------------------------------
    def sample(self, n: int = 10, folder: str = "outputs",
               mode: str = "test", ablation: bool = False):
        """Teacher-forced per-sample prediction CSVs (trainer.py:1066-1127)."""
        os.makedirs(folder, exist_ok=True)
        count = 0
        for batch in self._loader(mode).epoch(0):
            device_batch = self._put(batch)
            if ablation:
                device_batch["cad_image"] = jnp.zeros_like(
                    device_batch["cad_image"])
            from videocad_tpu.train.steps import prepare_model_inputs
            model_inputs, _ = prepare_model_inputs(device_batch)
            cmd_logits, param_logits = self._eval_forward(
                self.state.params, model_inputs)
            cmd_pred = jnp.argmax(cmd_logits, axis=-1)
            param_pred = apply_action_mask(
                cmd_pred, jnp.argmax(param_logits, axis=-1))
            pred = np.asarray(jnp.concatenate(
                [cmd_pred[..., None], param_pred], axis=-1))
            actions = np.asarray(device_batch["actions"])
            cad_images = np.asarray(batch["cad_image"])
            ids = batch.get("ids",
                            [str(count + i) for i in range(pred.shape[0])])
            for i, sample_id in enumerate(ids):
                self._save_cad_png(cad_images[i],
                                   os.path.join(folder,
                                                f"images_{sample_id}.png"))
                with open(os.path.join(
                        folder, f"pred_actions_{sample_id}.csv"), "w",
                        newline="") as f:
                    csv.writer(f).writerows(pred[i].tolist())
                with open(os.path.join(
                        folder, f"actions_{sample_id}.csv"), "w",
                        newline="") as f:
                    csv.writer(f).writerows(actions[i, 1:].tolist())
                count += 1
                if count >= n:
                    return
        return

    @staticmethod
    def _save_cad_png(cad: np.ndarray, path: str):
        """Save a (possibly normalized float) CAD image as a PNG
        (reference trainer.py:1126-1127)."""
        from PIL import Image
        if cad.dtype != np.uint8:
            cad = np.clip((cad * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        if cad.ndim == 3 and cad.shape[-1] == 1:
            cad = cad[..., 0]
        Image.fromarray(cad).save(path)

    # ------------------------------------------------------------------
    def find_first_mistake(self, mode: str = "test", tol: int = 3,
                           ablation: bool = False):
        """Per-sequence first-error analysis (trainer.py:1132-1260):
        for each tolerance level, record the first mistaken prediction, the
        (gt, pred) memory per field, sequence lengths, and mistake masks."""
        data = [self._init_mistake_bucket() for _ in range(tol)]
        for batch in self._loader(mode).epoch(0):
            device_batch = self._put(batch)
            if ablation:
                device_batch["cad_image"] = jnp.zeros_like(
                    device_batch["cad_image"])
            from videocad_tpu.train.steps import prepare_model_inputs
            model_inputs, targets = prepare_model_inputs(device_batch)
            cmd_logits, param_logits = self._eval_forward(
                self.state.params, model_inputs)
            cmd_pred = np.asarray(jnp.argmax(cmd_logits, axis=-1))
            param_pred = np.asarray(apply_action_mask(
                jnp.argmax(cmd_logits, axis=-1),
                jnp.argmax(param_logits, axis=-1)))
            targets = np.asarray(targets).astype(np.int64)
            for t in range(tol):
                for i in range(targets.shape[0]):
                    seq = self._sequence_mistakes(
                        targets[i, :, 0], targets[i, :, 1:],
                        cmd_pred[i], param_pred[i], t)
                    bucket = data[t]
                    for key, vals in seq["First Mistakes"].items():
                        bucket["First Mistakes"][key].extend(vals)
                    for key, vals in seq["Memory"].items():
                        bucket["Memory"][key].extend(vals)
                    bucket["Sequence Lengths"].append(seq["Sequence Lengths"])
                    bucket["Number of Mistakes"].append(seq["Number of Mistakes"])
        return data

    def _eval_forward(self, params, model_inputs):
        if not hasattr(self, "_fwd_jit"):
            self._fwd_jit = jax.jit(
                lambda p, b: self.model.apply({"params": p}, b,
                                              deterministic=True))
        return self._fwd_jit(params, model_inputs)

    @staticmethod
    def _init_mistake_bucket():
        return {
            "First Mistakes": {f"cmd_{i}": [] for i in range(5)}
            | {f"param_{i}": [] for i in range(6)},
            "Memory": {"cmd": [], **{f"param_{i}": [] for i in range(6)}},
            "Sequence Lengths": [],
            "Number of Mistakes": [],
        }

    @staticmethod
    def _param_error(diff: int, param_idx: int, tolerance: int) -> bool:
        # (trainer.py:1148-1158): two-sided for x/y/typed, one-sided windows
        # for key/times/scroll
        if param_idx in (0, 1, 5):
            return abs(diff) > tolerance
        if param_idx == 2:
            return diff < 0 or diff >= 50
        if param_idx == 3:
            return diff < 0 or diff >= 200
        if param_idx == 4:
            return diff < 0 or diff >= 500
        return False

    def _sequence_mistakes(self, gt_cmd, gt_params, pred_cmd, pred_params,
                           tolerance: int):
        seq = self._init_mistake_bucket()
        # padded tail (gt_cmd == -1) is excluded from the sequence
        valid = gt_cmd != -1
        length = int(valid.sum())
        mistakes = [0] * length
        first_mistake = noted = False
        for j in range(length):
            any_mistake = False
            g, p = int(gt_cmd[j]), int(pred_cmd[j])
            seq["Memory"]["cmd"].append([g, p])
            if g != p:
                mistakes[j] = 1
                any_mistake = True
                if not first_mistake:
                    seq["First Mistakes"][f"cmd_{g}"].append(f"cmd_{p}")
                    first_mistake = True
            for k in range(gt_params.shape[-1]):
                gp = int(gt_params[j, k])
                if gp == -1:
                    continue
                pp = int(pred_params[j, k])
                seq["Memory"][f"param_{k}"].append([gp, pp])
                diff = pp - gp
                if self._param_error(diff, k, tolerance) and not any_mistake:
                    mistakes[j] = 1
                    any_mistake = True
                if self._param_error(diff, k, tolerance) and not first_mistake:
                    seq["First Mistakes"][f"param_{k}"].append(f"param_{pp}")
                    first_mistake = True
            if first_mistake and not noted:
                seq["Sequence Lengths"] = [j, length]
                noted = True
        if not noted:
            seq["Sequence Lengths"] = [length, length]
        seq["Number of Mistakes"] = mistakes
        return seq

    # ------------------------------------------------------------------
    def _log_batch(self, epoch, batch_idx, avg_loss, metrics, sec_per_step):
        self.logger.save(metrics, f"epoch_{epoch + 1}")
        self.log(f"Epoch [{epoch + 1}], Batch [{batch_idx}], "
                 f"Loss: {avg_loss:.4f}, "
                 f"CMD Acc: {metrics['cmd_accuracy']:.2f}%, "
                 f"Params Acc: {metrics['params_accuracy']:.2f}%, "
                 f"{sec_per_step:.3f}s/step")

    def _log_epoch(self, epoch, epochs, avg_loss, metrics):
        acc = (100 * metrics["correct_predictions"]
               / max(metrics["total_predictions"], 1))
        self.log(f"Epoch [{epoch + 1}/{epochs}] Avg Loss: {avg_loss:.4f}, "
                 f"Accuracy: {acc:.2f}%, "
                 f"CMD: {metrics['cmd_accuracy']:.2f}%, "
                 f"Params: {metrics['params_accuracy']:.2f}%, "
                 f"Top-30 CMD: {metrics['cmd_accuracy_topk']:.2f}%")
