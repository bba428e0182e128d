"""Training state and optimizer construction.

Optimizer parity with the reference (/root/reference/trainer.py:236-253,
480-495): Adam with global-norm gradient clipping at 1.0, optional
per-component learning rates (CAD encoder / state encoder / rest) when
``frozen``, and a zero-LR CAD encoder when ``use_pretrained_cad_model``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any

    def apply_gradients(self, grads, tx):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(step=self.step + 1, params=new_params,
                          opt_state=new_opt_state)


def _param_group(path_names) -> str:
    if "cad_encoder" in path_names:
        return "cad"
    if "state_encoder" in path_names:
        return "state"
    return "rest"


def make_optimizer(training_config: Dict, freeze_cad: bool = False):
    """Build the optax transform per the reference's optimizer setup."""
    lr = training_config.get("lr", 1e-3)
    frozen = training_config.get("frozen", False)

    if frozen or freeze_cad:
        lr_cad = 0.0 if freeze_cad else training_config.get("lr_cad", 1e-3)
        lr_state = training_config.get("lr_state", 1e-3) if frozen else lr
        transforms = {
            "cad": optax.adam(lr_cad) if lr_cad > 0 else optax.set_to_zero(),
            "state": optax.adam(lr_state),
            "rest": optax.adam(lr),
        }

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda kp, _: _param_group([
                    getattr(e, "key", str(e)) for e in kp]),
                params)

        opt = optax.multi_transform(transforms, label_fn)
    else:
        opt = optax.adam(lr)
    return optax.chain(optax.clip_by_global_norm(1.0), opt)


def create_train_state(params, training_config: Dict,
                       freeze_cad: bool = False):
    tx = make_optimizer(training_config, freeze_cad)
    return TrainState(step=0, params=params, opt_state=tx.init(params)), tx


def create_sharded_train_state(params, training_config: Dict, mesh,
                               freeze_cad: bool = False):
    """TrainState laid out on a mesh: params per the TP rules, optimizer
    moments inheriting the param shardings via GSPMD propagation."""
    from videocad_tpu.parallel.sharding import shard_params

    tx = make_optimizer(training_config, freeze_cad)
    sharded = shard_params(mesh, params)
    state = jax.jit(
        lambda p: TrainState(step=0, params=p, opt_state=tx.init(p)))(sharded)
    return state, tx
