"""Train step: gradient flow, overfit slice, noise augmentation, optimizer groups."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.models import create_model, init_model
from videocad_tpu.train import (
    LossConfig,
    add_action_noise,
    create_train_state,
    make_eval_step,
    make_train_step,
    prepare_model_inputs,
)

CMD_WEIGHTS = (0.043, 0.029, 0.268, 0.6, 0.059)
LOSS_CFG = LossConfig(cmd_weights=CMD_WEIGHTS, use_mse=True)


def _setup(lr=3e-3, overrides=None, batch=2, seq_len=8, **tc):
    cfg_dict = dict(TINY_CONFIG, **(overrides or {}))
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    state, tx = create_train_state(params, {"lr": lr, **tc})
    data = synthetic_batch(np.random.default_rng(3), batch, seq_len,
                           image_size=cfg_dict["image_size"])
    batch_jnp = {k: jnp.asarray(v) for k, v in data.items()}
    return model, state, tx, batch_jnp


def test_prepare_model_inputs_teacher_forcing_shift():
    data = synthetic_batch(np.random.default_rng(0), 2, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    model_inputs, targets = prepare_model_inputs(batch)
    assert model_inputs["frames"].shape[1] == 5
    assert model_inputs["actions"].shape[1] == 5
    assert targets.shape[1] == 5
    # inputs normalized from actions[:, :-1], targets raw actions[:, 1:]
    np.testing.assert_allclose(
        np.asarray(model_inputs["actions"][:, 0, 0]),
        np.asarray(batch["actions"][:, 0, 0]) / 4.0, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(targets), np.asarray(batch["actions"][:, 1:]))


def test_overfit_single_batch():
    """Minimum end-to-end slice (BASELINE.json config 1): loss drops
    sharply and command accuracy saturates when overfitting one batch."""
    model, state, tx, batch = _setup(lr=3e-3, batch=2, seq_len=8)
    step = jax.jit(make_train_step(model, tx, LOSS_CFG),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    first_loss = None
    for i in range(60):
        state, loss, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(loss)
    final_loss = float(loss)
    assert final_loss < 0.25 * first_loss, (first_loss, final_loss)
    cmd_acc = sum(float(metrics[f"cmd_corrects_{i}"]) for i in range(5)) / max(
        sum(float(metrics[f"cmd_counts_{i}"]) for i in range(5)), 1)
    assert cmd_acc > 0.9, cmd_acc


def test_eval_step_runs_and_counts():
    model, state, tx, batch = _setup()
    eval_step = jax.jit(make_eval_step(model, LOSS_CFG))
    loss, metrics = eval_step(state.params, batch)
    assert np.isfinite(float(loss))
    assert float(metrics["total_predictions"]) > 0


def test_add_action_noise_touches_only_valid_slots():
    actions = jnp.asarray(np.array([
        [[0, 500, 500, -1, -1, -1, -1],   # move-to: x/y may jitter
         [3, -1, -1, -1, -1, -1, 400],    # type: typed value may jitter
         [4, -1, -1, -1, -1, -1, -1]],    # click: untouched
    ], dtype=np.float32))
    noised = np.asarray(add_action_noise(actions, jax.random.PRNGKey(1)))
    orig = np.asarray(actions)
    assert abs(noised[0, 0, 1] - orig[0, 0, 1]) <= 2
    assert abs(noised[0, 0, 2] - orig[0, 0, 2]) <= 2
    assert abs(noised[0, 1, 6] - orig[0, 1, 6]) <= 2
    np.testing.assert_array_equal(noised[0, 2], orig[0, 2])
    np.testing.assert_array_equal(noised[0, 0, 3:], orig[0, 0, 3:])


def test_frozen_param_groups_zero_cad_lr():
    model, state, tx, batch = _setup(
        overrides={"use_pretrained_cad_model": True})
    # gencad mode: the CAD input is the 3-channel 256x256 edge image
    batch = dict(batch, cad_image=jnp.asarray(np.random.default_rng(5)
                 .integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)))
    state, tx = create_train_state(
        state.params, {"lr": 1e-3}, freeze_cad=True)
    step = jax.jit(make_train_step(model, tx, LOSS_CFG), donate_argnums=(0,))
    before = jax.tree_util.tree_map(np.asarray, state.params["cad_encoder"])
    state, _, _ = step(state, batch, jax.random.PRNGKey(0))
    after = state.params["cad_encoder"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        before, after)
    # non-frozen params did move
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["predict_cmd"],
        dict(kernel=jnp.zeros_like(state.params["predict_cmd"]["kernel"]),
             bias=jnp.zeros_like(state.params["predict_cmd"]["bias"])))
    assert max(jax.tree_util.tree_leaves(moved)) > 0
