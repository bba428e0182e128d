"""Model forward: shapes, wiring modes, masks, and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.models import (
    VideoCADFormerConfig,
    banded_mask,
    causal_mask,
    create_model,
    init_model,
)


def _forward(config_overrides=None, batch=2, seq_len=8, num_views=0,
             deterministic=True, seed=0):
    cfg_dict = dict(TINY_CONFIG, **(config_overrides or {}))
    model = create_model(cfg_dict)
    rng = jax.random.PRNGKey(seed)
    params = init_model(model, rng, batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(seed), batch, seq_len,
                           image_size=cfg_dict["image_size"],
                           num_views=num_views)
    batch_jnp = {k: jnp.asarray(v) for k, v in data.items()}
    rngs = {} if deterministic else {"dropout": jax.random.PRNGKey(1)}
    out = model.apply({"params": params}, batch_jnp,
                      deterministic=deterministic, rngs=rngs)
    return out, model


def test_banded_mask_semantics():
    m = np.asarray(banded_mask(5, 5, 2))
    # row t attends cols (t-2, t]
    expected = np.zeros((5, 5), dtype=bool)
    for r in range(5):
        for c in range(5):
            expected[r, c] = (c > r - 2) and (c <= r)
    np.testing.assert_array_equal(m, expected)


def test_causal_mask_semantics():
    m = np.asarray(causal_mask(4))
    np.testing.assert_array_equal(m, np.tril(np.ones((4, 4), dtype=bool)))


@pytest.mark.parametrize("overrides", [
    {},  # past actions + past states
    {"enable_past_states": False},            # actions only
    {"enable_past_actions": False},           # states only
    {"enable_past_actions": False, "enable_past_states": False},  # CAD only
])
def test_forward_shapes_all_wiring_modes(overrides):
    (cmds, params), model = _forward(overrides)
    assert cmds.shape == (2, 8, 5)
    assert params.shape == (2, 8, 6, 1000)
    assert np.isfinite(np.asarray(cmds)).all()


def test_forward_with_multiview():
    (cmds, params), _ = _forward({"num_views": 2}, num_views=2)
    assert cmds.shape == (2, 8, 5)


def test_causality_past_actions_mode():
    """Changing a future action must not affect earlier predictions."""
    cfg_dict = dict(TINY_CONFIG)
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(0), 1, 8, image_size=32)
    b1 = {k: jnp.asarray(v) for k, v in data.items()}
    b2 = dict(b1)
    actions2 = np.array(data["actions"])
    actions2[:, 6] = [3, 1, 1, 1, 1, 1, 1]  # mutate a late action
    b2["actions"] = jnp.asarray(actions2)
    out1 = model.apply({"params": params}, b1, deterministic=True)[0]
    out2 = model.apply({"params": params}, b2, deterministic=True)[0]
    # predictions before t=6 unchanged; at/after t=6 changed
    np.testing.assert_allclose(out1[:, :6], out2[:, :6], atol=1e-5)
    assert not np.allclose(out1[:, 6:], out2[:, 6:])


def test_frame_window_limits_influence():
    """With window_size=w and ONE decoder layer, frames older than w steps
    can't affect step t. (With stacked layers, influence legitimately
    propagates through earlier positions' self-attention — matching the
    reference decoder's behavior.)"""
    cfg_dict = dict(TINY_CONFIG, window_size=2, num_decoder_layers=1)
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(0), 1, 8, image_size=32)
    b1 = {k: jnp.asarray(v) for k, v in data.items()}
    frames2 = np.array(data["frames"])
    # Non-uniform perturbation (a constant shift would be invisible to the
    # ViT's first LayerNorm).
    frames2[:, 0] += np.random.default_rng(9).random(frames2[:, 0].shape,
                                                     dtype=np.float32)
    b2 = dict(b1, frames=jnp.asarray(frames2))
    out1 = model.apply({"params": params}, b1, deterministic=True)[0]
    out2 = model.apply({"params": params}, b2, deterministic=True)[0]
    # step >= 2 is outside frame 0's window (band (t-2, t])
    np.testing.assert_allclose(out1[:, 2:], out2[:, 2:], atol=1e-5)
    assert not np.allclose(out1[:, :2], out2[:, :2])


def test_dropout_changes_outputs_and_determinism():
    cfg_dict = dict(TINY_CONFIG, dropout=0.2)
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(0), 1, 4, image_size=32)
    b = {k: jnp.asarray(v) for k, v in data.items()}
    det = model.apply({"params": params}, b, deterministic=True)[0]
    det2 = model.apply({"params": params}, b, deterministic=True)[0]
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    tr = model.apply({"params": params}, b, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})[0]
    assert not np.allclose(np.asarray(det), np.asarray(tr))


@pytest.mark.slow
def test_resnet_encoder_mode():
    (cmds, _), _ = _forward({"encoder": "resnet"}, seq_len=4)
    assert cmds.shape == (2, 4, 5)


def test_remat_encoder_matches_plain():
    out_plain, _ = _forward({}, seed=5)
    out_remat, _ = _forward({"remat_encoder": True}, seed=5)
    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_remat[0]), atol=1e-6)


def test_bfloat16_compute_runs():
    (cmds, params), _ = _forward({"dtype": "bfloat16"}, seq_len=4)
    assert cmds.dtype == jnp.float32  # heads stay f32
    assert np.isfinite(np.asarray(cmds)).all()
