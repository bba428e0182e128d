"""Incremental (frame-at-a-time) decode equals the batch rollout.

VERDICT r2 next-round #4: a host driving ``incremental_decode_step`` once
per arriving frame must produce, step for step, exactly the sequence the
all-frames-upfront batch rollout (infer/rollout.py) produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.infer.incremental import (
    incremental_decode_step,
    init_decode_carry,
)
from videocad_tpu.infer.rollout import sequential_inference
from videocad_tpu.models import create_model, init_model


def _build(config_overrides):
    cfg_dict = dict(TINY_CONFIG, **config_overrides)
    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    return model, params


def _frames(b, t, size, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (b, t, size, size, 3),
                                    dtype=np.uint8))


@pytest.mark.parametrize("overrides", [
    # flagship wiring: actions + states + timestep embedding
    dict(enable_past_actions=True, enable_past_states=True,
         enable_timestep_embedding=True, window_size=3),
    # actions only (frames never join the memory — reference quirk)
    dict(enable_past_actions=True, enable_past_states=False,
         enable_timestep_embedding=False, window_size=2),
], ids=["actions+states+ts", "actions-only"])
def test_incremental_equals_batch_rollout(overrides):
    model, params = _build(overrides)
    cfg = model.config
    b, t = 2, 6
    frames = _frames(b, t, cfg.image_size)
    cad = _frames(b, 1, cfg.image_size, seed=1)[:, 0]

    batch_cmds, batch_params = sequential_inference(model, params, frames,
                                                    cad)

    carry = init_decode_carry(model, params, cad, seq_len=t)
    step_cmds, step_params = [], []
    for i in range(t):
        carry, cmd_logits, param_logits = incremental_decode_step(
            model, params, frames[:, i], carry)
        step_cmds.append(cmd_logits)
        step_params.append(param_logits)
    inc_cmds = jnp.stack(step_cmds, axis=1)
    inc_params = jnp.stack(step_params, axis=1)

    np.testing.assert_allclose(np.asarray(inc_cmds),
                               np.asarray(batch_cmds), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(inc_params),
                               np.asarray(batch_params), rtol=1e-5,
                               atol=1e-5)
    # The decoded action sequences (the serving output) match exactly.
    np.testing.assert_array_equal(
        np.argmax(np.asarray(inc_cmds), -1),
        np.argmax(np.asarray(batch_cmds), -1))
    assert int(carry["t"]) == t


@pytest.mark.parametrize("weight_quant,bits", [("int8", 8), ("int4", 4)])
def test_incremental_quantized_equals_quantized_rollout(weight_quant, bits):
    """w8a16 / w4a16 serving: driving the incremental step with a decoder
    pre-quantized once per session (rollout.quantize_for_decode) equals
    the batch rollout's weight_quant mode step for step — both paths
    round the weights with identical math, so the whole quantized
    trajectory (including fed-back actions) must agree."""
    from videocad_tpu.infer.rollout import quantize_for_decode

    model, params = _build(dict(enable_past_actions=True,
                                enable_past_states=True,
                                enable_timestep_embedding=True,
                                window_size=3))
    cfg = model.config
    b, t = 2, 6
    frames = _frames(b, t, cfg.image_size)
    cad = _frames(b, 1, cfg.image_size, seed=1)[:, 0]

    batch_cmds, batch_params = sequential_inference(
        model, params, frames, cad, weight_quant=weight_quant)

    qparams = quantize_for_decode(params, cfg.compute_dtype, bits=bits)
    carry = init_decode_carry(model, qparams, cad, seq_len=t)
    step_cmds, step_params = [], []
    for i in range(t):
        carry, cmd_logits, param_logits = incremental_decode_step(
            model, qparams, frames[:, i], carry)
        step_cmds.append(cmd_logits)
        step_params.append(param_logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(step_cmds, 1)),
                               np.asarray(batch_cmds), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.stack(step_params, 1)),
                               np.asarray(batch_params), rtol=1e-5,
                               atol=1e-5)


def test_incremental_prepared_fused_equals_rollout():
    """A session tree prepared with rollout.prepare_for_decode (compute
    dtype + fused q/k/v) drives the incremental step to the same
    trajectory as the batch rollout — the fused matmul is columnwise
    bitwise-identical to the three separate dots."""
    from videocad_tpu.infer.rollout import prepare_for_decode

    model, params = _build(dict(enable_past_actions=True,
                                enable_past_states=True,
                                enable_timestep_embedding=True,
                                window_size=3))
    cfg = model.config
    b, t = 2, 5
    frames = _frames(b, t, cfg.image_size)
    cad = _frames(b, 1, cfg.image_size, seed=1)[:, 0]
    batch_cmds, _ = sequential_inference(model, params, frames, cad)

    fused = prepare_for_decode(params, cfg.compute_dtype)
    assert "qkv" in fused["decoder"]["layers_0"]["self_attn"]
    carry = init_decode_carry(model, fused, cad, seq_len=t)
    cmds = []
    for i in range(t):
        carry, cmd_logits, _ = incremental_decode_step(
            model, fused, frames[:, i], carry)
        cmds.append(cmd_logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(cmds, 1)),
                               np.asarray(batch_cmds), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_incremental_decode_under_mesh():
    """The serving step runs with batch-sharded inputs on a (data, model)
    mesh and still equals the batch rollout — serving scales the same way
    training does."""
    from videocad_tpu.parallel.mesh import batch_sharding, create_mesh

    model, params = _build(dict(enable_past_actions=True,
                                enable_past_states=True, window_size=3))
    mesh = create_mesh(4, 2)
    sharding = batch_sharding(mesh)
    b, t = 8, 4
    frames = jax.device_put(_frames(b, t, model.config.image_size), sharding)
    cad = jax.device_put(_frames(b, 1, model.config.image_size, seed=1)[:, 0],
                         sharding)

    batch_cmds, _ = sequential_inference(model, params, frames, cad)
    carry = init_decode_carry(model, params, cad, seq_len=t)
    cmds = []
    for i in range(t):
        carry, cmd_logits, _ = incremental_decode_step(
            model, params, frames[:, i], carry)
        cmds.append(cmd_logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(cmds, 1)),
                               np.asarray(batch_cmds), rtol=1e-5, atol=1e-5)


def test_incremental_step_past_horizon_freezes_carry():
    """Driving the step past seq_len must NOT clamp the cache write onto
    the final slot: the carry (t, action, every cache) stays bit-frozen,
    so an overrunning caller gets garbage logits but no state corruption."""
    model, params = _build(dict(enable_past_actions=True,
                                enable_past_states=True, window_size=3))
    t = 3
    frames = _frames(1, t + 1, model.config.image_size)
    cad = _frames(1, 1, model.config.image_size, seed=1)[:, 0]
    carry = init_decode_carry(model, params, cad, seq_len=t)
    for i in range(t):
        carry, _, _ = incremental_decode_step(model, params,
                                              frames[:, i], carry)
    before = [np.asarray(leaf)
              for leaf in jax.tree_util.tree_leaves(carry)]
    carry, _, _ = incremental_decode_step(model, params, frames[:, t],
                                          carry)   # one past the horizon
    after = jax.tree_util.tree_leaves(carry)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, np.asarray(a))
    assert int(carry["t"]) == t


def test_rollout_weight_quant_requires_action_feedback():
    """weight_quant on a no-feedback config would silently measure the
    full-precision forward under a quantized label — it must raise, both
    live and at export."""
    from videocad_tpu.infer.export import export_model

    model, params = _build(dict(enable_past_actions=False,
                                enable_past_states=True))
    frames = _frames(1, 3, model.config.image_size)
    cad = _frames(1, 1, model.config.image_size, seed=1)[:, 0]
    with pytest.raises(ValueError, match="enable_past_actions"):
        sequential_inference(model, params, frames, cad,
                             weight_quant="int8")
    cfg = dict(TINY_CONFIG, enable_past_actions=False)
    with pytest.raises(ValueError, match="enable_past_actions"):
        export_model(cfg, params, 1, 4, "/tmp/never_written.vcdx",
                     weight_quant="int8")


def test_incremental_rejects_no_action_feedback():
    model, params = _build(dict(enable_past_actions=False,
                                enable_past_states=True))
    cad = _frames(1, 1, model.config.image_size)[:, 0]
    with pytest.raises(ValueError, match="enable_past_actions"):
        init_decode_carry(model, params, cad, seq_len=4)
