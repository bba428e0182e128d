"""Action vocabulary + mask/normalization semantics (reference parity)."""

import jax.numpy as jnp
import numpy as np

from videocad_tpu.actions import (
    ACTION_PARAM_MASK,
    apply_action_mask,
    normalize_actions,
    param_validity_mask,
)


def test_normalize_actions_scaling():
    actions = jnp.array([[[4, 999, 0, -1, 500, -1, -1]]], dtype=jnp.int32)
    out = normalize_actions(actions)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0],
        [1.0, 0.999, 0.0, -0.001, 0.5, -0.001, -0.001],
        rtol=1e-6,
    )


def test_param_validity_table():
    cmds = jnp.arange(5)
    mask = np.asarray(param_validity_mask(cmds))
    np.testing.assert_array_equal(mask, np.asarray(ACTION_PARAM_MASK, dtype=np.float32))


def test_apply_action_mask_invalidates_unused_params():
    # move-to (cmd 0): only x,y survive
    cmd = jnp.array([[0]])
    params = jnp.array([[[10, 20, 30, 40, 50, 60]]])
    out = np.asarray(apply_action_mask(cmd, params))[0, 0]
    np.testing.assert_array_equal(out, [10, 20, -1, -1, -1, -1])


def test_apply_action_mask_click_clears_all():
    cmd = jnp.array([[4]])
    params = jnp.array([[[1, 2, 3, 4, 5, 6]]])
    out = np.asarray(apply_action_mask(cmd, params))[0, 0]
    np.testing.assert_array_equal(out, [-1] * 6)


def test_apply_action_mask_times_key_window_rule():
    # press-keys (cmd 1): key + times valid, but times survives only when
    # key in [200, 250)
    cmd = jnp.array([[1, 1, 1]])
    params = jnp.array([
        [[0, 0, 200, 400, 0, 0],   # key=200 -> times kept
         [0, 0, 250, 400, 0, 0],   # key=250 -> times dropped
         [0, 0, 199, 400, 0, 0]],  # key=199 -> times dropped
    ])
    out = np.asarray(apply_action_mask(cmd, params))
    assert out[0, 0, 3] == 400
    assert out[0, 1, 3] == -1
    assert out[0, 2, 3] == -1
    # key itself survives for all three
    np.testing.assert_array_equal(out[0, :, 2], [200, 250, 199])


def test_apply_action_mask_key3_rule_uses_masked_param2():
    # cmd 3 (type): param 2 is masked to -1 first, so even if the raw param 2
    # was in-window, times must be -1 (reference applies the rule after
    # masking — autoregressive_transformer.py:101-107).
    cmd = jnp.array([[3]])
    params = jnp.array([[[0, 0, 220, 400, 0, 777]]])
    out = np.asarray(apply_action_mask(cmd, params))[0, 0]
    np.testing.assert_array_equal(out, [-1, -1, -1, -1, -1, 777])
