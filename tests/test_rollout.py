"""Rollout equivalence: KV-cached scan decode == reference prefix re-forwarding."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.actions.ops import apply_action_mask, normalize_actions
from videocad_tpu.infer.rollout import sequential_inference
from videocad_tpu.models import create_model, init_model


def naive_sequential_inference(model, params, frames, cad_image, action=True):
    """The reference algorithm verbatim: full forward over each prefix
    (autoregressive_transformer.py:222-274)."""
    b, t_total = frames.shape[:2]
    actions = jnp.zeros((b, 1, 7), jnp.float32)
    cmds, param_logits = [], []
    for t in range(t_total):
        inputs = {
            "frames": frames[:, :t + 1],
            "actions": actions if action else jnp.zeros((b, t + 1, 7)),
            "cad_image": cad_image,
        }
        cmd, params_out = model.apply({"params": params}, inputs,
                                      deterministic=True)
        cmds.append(cmd[:, -1])
        param_logits.append(params_out[:, -1])
        if action:
            cmd_pred = jnp.argmax(cmd[:, -1], axis=-1)
            param_pred = jnp.argmax(params_out[:, -1], axis=-1)
            masked = apply_action_mask(cmd_pred, param_pred)
            nxt = jnp.concatenate([cmd_pred[:, None], masked],
                                  axis=-1).astype(jnp.float32)
            actions = jnp.concatenate(
                [actions, normalize_actions(nxt)[:, None]], axis=1)
    return jnp.stack(cmds, axis=1), jnp.stack(param_logits, axis=1)


def _setup(overrides=None, seq_len=6):
    cfg_dict = dict(TINY_CONFIG, **(overrides or {}))
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(1), 2, seq_len, image_size=32)
    frames = jnp.asarray(data["frames"])
    cad = jnp.asarray(data["cad_image"])
    return model, params, frames, cad


@pytest.mark.slow
def test_rollout_matches_naive_prefix_loop_with_actions():
    model, params, frames, cad = _setup()
    ref_cmds, ref_params = naive_sequential_inference(model, params, frames, cad)
    fast_cmds, fast_params = sequential_inference(model, params, frames, cad)
    np.testing.assert_allclose(np.asarray(ref_cmds), np.asarray(fast_cmds),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ref_params), np.asarray(fast_params),
                               atol=2e-4, rtol=1e-4)
    # decoded action sequences identical
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(ref_cmds, -1)),
        np.asarray(jnp.argmax(fast_cmds, -1)))


def test_rollout_matches_naive_without_action_feedback():
    model, params, frames, cad = _setup()
    ref = naive_sequential_inference(model, params, frames, cad, action=False)
    fast = sequential_inference(model, params, frames, cad, action=False)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(fast[0]),
                               atol=2e-4, rtol=1e-4)


def test_rollout_states_only_mode_single_pass():
    model, params, frames, cad = _setup({"enable_past_actions": False})
    ref = naive_sequential_inference(model, params, frames, cad, action=False)
    fast = sequential_inference(model, params, frames, cad, action=False)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(fast[0]),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(fast[1]),
                               atol=2e-4, rtol=1e-4)


def test_weight_quant_decode_tracks_exact_rollout():
    """w8a16 serving mode (quantize_decode_weights): int8 decoder weights
    perturb logits only at the per-column rounding level.

    Measured without action feedback: with feedback a single flipped
    argmax rewrites the fed-back action and the trajectories legitimately
    diverge after that step — on a random tiny model every logit is a
    near-tie, so only the direct (non-compounding) noise is a meaningful
    contract.
    """
    model, params, frames, cad = _setup()
    exact_cmds, _ = sequential_inference(model, params, frames, cad,
                                         action=False)
    q_cmds, _ = sequential_inference(model, params, frames, cad,
                                     action=False, weight_quant="int8")
    scale = float(jnp.std(exact_cmds))
    err = float(jnp.max(jnp.abs(exact_cmds - q_cmds)))
    assert err < 0.1 * max(scale, 1.0), (err, scale)
    agree = float(jnp.mean((jnp.argmax(exact_cmds, -1)
                            == jnp.argmax(q_cmds, -1)).astype(jnp.float32)))
    assert agree > 0.9, agree


def test_quantize_decode_weights_roundtrip():
    from videocad_tpu.infer.rollout import quantize_decode_weights
    model, params, _, _ = _setup()
    qtree = quantize_decode_weights(params["decoder"], jnp.float32)
    layer = qtree["layers_0"]["self_attn"]["query"]
    assert layer["kernel_q"].dtype == jnp.int8
    orig = params["decoder"]["layers_0"]["self_attn"]["query"]["kernel"]
    deq = layer["kernel_q"].astype(jnp.float32) * layer["scale"]
    # per-column symmetric int8: elementwise error <= scale/2 per column
    col_scale = np.asarray(layer["scale"])[0]
    err = np.abs(np.asarray(deq) - np.asarray(orig))
    assert (err <= col_scale[None, :] * 0.5 + 1e-7).all()
    # LayerNorm affines stay unquantized
    assert "scale" in qtree["layers_0"]["norm1"]
    assert qtree["layers_0"]["norm1"]["scale"].dtype == jnp.float32
