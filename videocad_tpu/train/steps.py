"""Pure jittable train / eval steps.

The reference hot loop (/root/reference/trainer.py:480-517) becomes one
compiled program: teacher-forcing shift, optional action-noise
augmentation, forward, class-weighted tolerance loss, global-norm clip,
Adam update. Under pjit with a batch sharded over the 'data' mesh axis the
gradient and metric reductions lower to psums over ICI — the DDP allreduce
with no Python in the way.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from videocad_tpu.actions.ops import normalize_actions
from videocad_tpu.actions.vocab import CMD_MOVE_TO, CMD_TYPE
from videocad_tpu.train.objective import LossConfig, compute_loss_and_metrics
from videocad_tpu.train.state import TrainState


def add_action_noise(actions: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """±2-bin jitter on move-to x/y and typed value (trainer.py:498-505).

    Applied to the raw batch actions, so both the teacher-forced inputs and
    the targets see the noise — matching the reference.
    """
    # Deliberately UNCLAMPED, like the reference: a boundary value can
    # jitter to -1 (the pad sentinel — that step silently drops from the
    # loss) or past the top bin (999 + 2 = 1001, outside the vocab). Both
    # are rare one-in-a-thousand edges the reference trains through;
    # clamping would change gradients vs parity.
    r1, r2 = jax.random.split(rng)
    cmd = actions[..., 0:1]
    xy_noise = jax.random.randint(r1, actions[..., 1:3].shape, -2, 3)
    typed_noise = jax.random.randint(r2, actions[..., 6:7].shape, -2, 3)
    actions = actions.at[..., 1:3].add(
        xy_noise * (cmd == CMD_MOVE_TO).astype(actions.dtype))
    actions = actions.at[..., 6:7].add(
        typed_noise * (cmd == CMD_TYPE).astype(actions.dtype))
    return actions


def prepare_model_inputs(batch: Dict[str, jnp.ndarray]) -> Tuple[Dict, jnp.ndarray]:
    """Teacher-forcing shift: inputs drop the last step, targets the first.

    (reference trainer.py:507-517; normalize-then-shift order preserved)
    """
    model_inputs = {
        "frames": batch["frames"][:, :-1],
        "actions": normalize_actions(batch["actions"])[:, :-1],
        "cad_image": batch["cad_image"],
    }
    if batch.get("multiview_images") is not None:
        model_inputs["multiview_images"] = batch["multiview_images"]
    targets = batch["actions"][:, 1:]
    return model_inputs, targets


def make_train_step(model, tx, loss_config: LossConfig, noise: bool = False,
                    dropout_rng_impl: str = "rbg"):
    """Returns train_step(state, batch, rng) -> (state, loss, metrics).

    dropout_rng_impl: "rbg" (default) reseeds the per-step dropout key
    into JAX's RBG generator — dropout masks then lower to the TPU's
    RngBitGenerator HLO instead of threefry chains. Measured on the
    flagship config: threefry mask generation (fused into the MLP
    weight-gradient matmuls) cost ~45 ms of a 190 ms step; rbg removes it
    (7,849 -> 10,568 frames/s/chip). Pass "threefry" for masks that are
    bit-identical across backends/versions.
    """

    def loss_fn(params, batch, dropout_rng):
        model_inputs, targets = prepare_model_inputs(batch)
        preds = model.apply({"params": params}, model_inputs,
                            deterministic=False,
                            rngs={"dropout": dropout_rng})
        loss, metrics = compute_loss_and_metrics(
            preds[0], preds[1], targets, loss_config)
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        noise_rng, dropout_rng = jax.random.split(
            jax.random.fold_in(rng, state.step))
        if dropout_rng_impl != "threefry":
            from videocad_tpu.ops.prng import derive_seed
            dropout_rng = jax.random.key(derive_seed(dropout_rng),
                                         impl=dropout_rng_impl)
        if noise:
            batch = dict(batch, actions=add_action_noise(
                batch["actions"], noise_rng))
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, dropout_rng)
        new_state = state.apply_gradients(grads, tx)
        return new_state, loss, metrics

    return train_step


def make_eval_step(model, loss_config: LossConfig, ablate_cad: bool = False):
    """Teacher-forced evaluation step (trainer.py:713-750)."""

    def eval_step(params, batch):
        model_inputs, targets = prepare_model_inputs(batch)
        if ablate_cad:
            model_inputs["cad_image"] = jnp.zeros_like(
                model_inputs["cad_image"])
        preds = model.apply({"params": params}, model_inputs,
                            deterministic=True)
        loss, metrics = compute_loss_and_metrics(
            preds[0], preds[1], targets, loss_config)
        return loss, metrics

    return eval_step


def jit_train_step(train_step, mesh=None, batch_sharding=None,
                   state_shardings=None):
    """jit with donation; shardings optional (single-device tests skip them).

    With a mesh, the state/batch shardings are pinned as in/out
    constraints: GSPMD is then contractually bound to the TP/DP layout
    every step instead of merely inheriting it from the committed inputs
    (which leaves it free to re-layout the optimizer state between steps).
    The rng key and the scalar loss/metric outputs are replicated.
    """
    kwargs = {}
    if batch_sharding is not None:
        from videocad_tpu.parallel.mesh import replicated

        rep = replicated(mesh) if mesh is not None else None
        kwargs["in_shardings"] = (state_shardings, batch_sharding, rep)
        kwargs["out_shardings"] = (state_shardings, rep, rep)
    return jax.jit(train_step, donate_argnums=(0,), **kwargs)
