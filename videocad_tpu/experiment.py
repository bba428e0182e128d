"""Experiment orchestration: named configs, grid sweeps, result JSON layout.

Mirror of the reference Experiment (/root/reference/experiment.py): builds
an experiment name, saves params.json/training_config.json under
logs/<name>/, instantiates the model from the named JSON config, trains,
evaluates on test (plus optional sequential eval), and writes results.json /
seq_results.json. List-valued params expand to a cartesian grid
(experiment.py:134-144).
"""

from __future__ import annotations

import datetime
import itertools
import os
from typing import Any, Dict, Optional

import jax

from videocad_tpu.models.factory import create_model, init_model
from videocad_tpu.train.objective import REFERENCE_CMD_WEIGHTS, LossConfig
from videocad_tpu.train.trainer import Trainer
from videocad_tpu.utils.io import load_json, save_json


def _timestamp() -> str:
    return datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")


def default_loss_config(training_config: Dict,
                        class_weights_path: Optional[str] = None) -> LossConfig:
    """LossConfig from a class_weights.json (dataset statistics; see
    tools/compute_class_weights.py) or the published Label weights."""
    if class_weights_path and os.path.exists(class_weights_path):
        weights = load_json(class_weights_path)
        return LossConfig.from_class_weights(
            weights, use_mse=training_config.get("use_mse", True))
    return LossConfig(
        cmd_weights=REFERENCE_CMD_WEIGHTS,
        use_mse=training_config.get("use_mse", True))


class Experiment:
    def __init__(self, train_pipe, val_pipe, test_pipe, training_config: Dict,
                 mesh=None, log_dir: str = "logs",
                 class_weights_path: Optional[str] = "class_weights.json"):
        self.train_pipe = train_pipe
        self.val_pipe = val_pipe
        self.test_pipe = test_pipe
        self.training_config = dict(training_config)
        self.mesh = mesh
        self.log_dir = log_dir
        self.class_weights_path = class_weights_path

    def _experiment_name(self, params: Dict, name: str = "") -> str:
        if name:
            return f"{name}_{_timestamp()}"
        parts = []
        for v in params.values():
            if isinstance(v, list):
                parts.append("_".join(str(s) for s in v))
            else:
                parts.append(str(v))
        return f"{_timestamp()}_{'_'.join(parts)}"

    def run_with_params(self, experiment_params: Dict[str, Any],
                        name: str = "") -> Dict:
        experiment_name = self._experiment_name(experiment_params, name)
        training_config = dict(self.training_config,
                               experiment_name=experiment_name)
        for k, v in experiment_params.get("train_config", {}).items():
            training_config[k] = v

        exp_dir = os.path.join(self.log_dir, experiment_name)

        params = None
        state_dict_path = experiment_params.get("state_dict")
        if state_dict_path and state_dict_path.endswith((".pt", ".pth")):
            # Warm start directly from a reference torch checkpoint
            # (experiment.py:61-71 accepts a .pt path) — converted on the
            # fly; generation quirks (legacy vit naming) are auto-detected
            # and folded into the model config.
            import torch
            from tools.convert_torch_checkpoint import (
                convert_state_dict, detect_config_overrides)
            ckpt = torch.load(state_dict_path, map_location="cpu",
                              weights_only=False)
            sd = ckpt.get("model_state_dict", ckpt)
            experiment_params = dict(experiment_params,
                                     **detect_config_overrides(sd))
            model = create_model(experiment_params)
            params = jax.tree_util.tree_map(
                lambda x: jax.numpy.asarray(x),
                convert_state_dict(sd, experiment_params))
        else:
            model = create_model(experiment_params)
        # Saved AFTER the torch-checkpoint override merge: params.json must
        # describe the model actually trained (detect_config_overrides can
        # flip vit_patch_norm/vit_final_norm for legacy .pt generations, and
        # a record missing that would rebuild a mismatched module tree).
        if jax.process_index() == 0:
            os.makedirs(exp_dir, exist_ok=True)
            save_json(experiment_params, os.path.join(exp_dir, "params.json"))
            save_json(training_config,
                      os.path.join(exp_dir, "training_config.json"))
        if state_dict_path and params is None:
            # warm start from an Orbax checkpoint dir (experiment.py:61-71)
            from videocad_tpu.train.checkpoint import CheckpointHandler
            base, ckpt_name = os.path.split(state_dict_path.rstrip("/"))
            handler = CheckpointHandler(os.path.basename(base),
                                        os.path.dirname(base) or ".")
            init = init_model(model, jax.random.PRNGKey(
                training_config.get("seed", 0)), batch=1, seq_len=2)
            from videocad_tpu.train.state import TrainState, make_optimizer
            tx = make_optimizer(training_config)
            target = TrainState(step=0, params=init, opt_state=tx.init(init))
            restored, _ = handler.restore(ckpt_name, target)
            params = restored.params

        loss_config = default_loss_config(training_config,
                                          self.class_weights_path)
        trainer = Trainer(model, self.train_pipe, self.val_pipe,
                          self.test_pipe, training_config, loss_config,
                          params=params, mesh=self.mesh, log_dir=self.log_dir)
        if training_config.get("resume", False):
            trainer.resume()
        trainer.train(training_config.get("epochs", 100))

        results = trainer.evaluate(mode="test")
        if jax.process_index() == 0:
            save_json(results, os.path.join(exp_dir, "results.json"))
        if training_config.get("sequential", False):
            # All hosts must participate (the rollout's collectives span the
            # mesh); only the save is gated.
            seq_results = trainer.sequential_evaluate(mode="test")
            if jax.process_index() == 0:
                save_json(seq_results,
                          os.path.join(exp_dir, "seq_results.json"))
        return results

    def run_grid(self, experiment_params: Dict[str, Any]):
        """Cartesian product over list-valued params."""
        listed = {k: v if isinstance(v, list) else [v]
                  for k, v in experiment_params.items()}
        results = []
        for combo in itertools.product(*listed.values()):
            results.append(self.run_with_params(dict(zip(listed, combo))))
        return results

    def run_with_config(self, config_path, config_name: str = ""):
        configs = load_json(config_path) if isinstance(config_path, str) \
            else config_path
        if config_name:
            return self.run_with_params(configs[config_name], config_name)
        return {name: self.run_with_params(params, name)
                for name, params in configs.items()}
