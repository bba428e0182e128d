"""Serving export (.vcdx artifacts): round-trip fidelity vs the live model."""

import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.data.synthetic import synthetic_batch_feed
from videocad_tpu.infer.export import export_model, load_exported
from videocad_tpu.infer.rollout import sequential_inference
from videocad_tpu.models import create_model, init_model


def _artifact(tmp_path, batch=1, bucket=6):
    config = dict(TINY_CONFIG)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny.vcdx")
    meta = export_model(config, params, batch, bucket, out)
    return config, model, params, out, meta


@pytest.mark.slow
def test_export_roundtrip_forward_and_rollout(tmp_path):
    config, model, params, out, meta = _artifact(tmp_path)
    assert meta["format_version"] == 3 and meta["has_rollout"]
    loaded = load_exported(out)

    data = synthetic_batch_feed(1, 6, image_size=32, channels=3, seed=0)
    frames = jnp.asarray(data["frames"])
    actions = jnp.asarray(data["actions"], jnp.float32)
    cad = jnp.asarray(data["cad_image"])

    # teacher-forced forward: artifact == live model (same backend)
    live = model.apply(
        {"params": params},
        {"frames": frames[:, :-1], "actions": actions[:, :-1],
         "cad_image": cad},
        deterministic=True)
    exported = loaded.forward(frames[:, :-1], actions[:, :-1], cad)
    for a, b in zip(exported, live):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # rollout: artifact == live scan engine
    live_roll = sequential_inference(model, params, frames, cad)
    exp_roll = loaded.rollout(frames, cad)
    for a, b in zip(exp_roll, live_roll):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    # identical decoded action sequences
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(exp_roll[0], -1)),
        np.asarray(jnp.argmax(live_roll[0], -1)))


@pytest.mark.slow
def test_multiview_export_carries_views_in_every_program(tmp_path):
    """A num_views config's forward/rollout/decode_init must consume the
    view stack (encode_cad_stream silently skips views when handed None,
    so a view-less export would serve predictions that diverge from
    training-time eval). Checks: artifact == live model WITH views,
    artifact(view A) != artifact(view B), and missing/stray views raise."""
    import pytest

    config = dict(TINY_CONFIG, num_views=2)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny_mv.vcdx")
    meta = export_model(config, params, 1, 4, out)
    assert meta["multiview"] and meta["num_views"] == 2
    loaded = load_exported(out)

    data = synthetic_batch_feed(1, 4, image_size=32, channels=3, seed=0)
    frames = jnp.asarray(data["frames"])
    actions = jnp.asarray(data["actions"], jnp.float32)
    cad = jnp.asarray(data["cad_image"])
    rng = np.random.default_rng(7)
    mv = jnp.asarray(rng.integers(0, 256, (1, 2, 32, 32, 3), np.uint8))
    mv2 = jnp.asarray(rng.integers(0, 256, (1, 2, 32, 32, 3), np.uint8))

    live = model.apply(
        {"params": params},
        {"frames": frames[:, :-1], "actions": actions[:, :-1],
         "cad_image": cad, "multiview_images": mv},
        deterministic=True)
    got = loaded.forward(frames[:, :-1], actions[:, :-1], cad, mv)
    for a, b in zip(got, live):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    # the views are load-bearing: different views, different logits
    other = loaded.forward(frames[:, :-1], actions[:, :-1], cad, mv2)
    assert not np.allclose(np.asarray(got[0]), np.asarray(other[0]))

    live_roll = sequential_inference(model, params, frames, cad,
                                     multiview_images=mv)
    exp_roll = loaded.rollout(frames, cad, mv)
    for a, b in zip(exp_roll, live_roll):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # decode pair consumes views too, equal to the batch rollout
    carry = loaded.decode_init(cad, mv)
    step_cmds = []
    for i in range(4):
        carry, cmd_logits, _ = loaded.decode_step(frames[:, i], carry)
        step_cmds.append(cmd_logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(step_cmds, 1)),
                               np.asarray(live_roll[0]),
                               atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="multiview_images is required"):
        loaded.forward(frames[:, :-1], actions[:, :-1], cad)
    with pytest.raises(ValueError, match="multiview_images is required"):
        loaded.decode_init(cad)

    # stray views on a non-multiview artifact must also fail loudly
    config0 = dict(TINY_CONFIG)
    model0 = create_model(config0)
    params0 = init_model(model0, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out0 = os.path.join(str(tmp_path), "tiny_plain.vcdx")
    export_model(config0, params0, 1, 4, out0)
    with pytest.raises(ValueError, match="without multiview"):
        load_exported(out0).forward(frames[:, :-1], actions[:, :-1],
                                    cad, mv)


def test_artifact_layout_and_config(tmp_path):
    config, _, _, out, _ = _artifact(tmp_path)
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        assert {"config.json", "meta.json", "params.npz",
                "forward.shlo", "rollout.shlo", "decode_init.shlo",
                "decode_step.shlo"} <= names
        assert json.loads(zf.read("config.json")) == config


def test_exported_decode_step_equals_rollout(tmp_path):
    """Driving the exported incremental pair frame by frame equals the
    exported batch rollout, step for step (VERDICT r2 next-round #4)."""
    config, model, params, out, meta = _artifact(tmp_path)
    assert meta["has_decode"]
    loaded = load_exported(out)

    data = synthetic_batch_feed(1, 6, image_size=32, channels=3, seed=2)
    frames = jnp.asarray(data["frames"])
    cad = jnp.asarray(data["cad_image"])
    roll_cmds, roll_params = loaded.rollout(frames, cad)

    carry = loaded.decode_init(cad)
    step_cmds, step_params = [], []
    for i in range(frames.shape[1]):
        carry, cmd_logits, param_logits = loaded.decode_step(
            frames[:, i], carry)
        step_cmds.append(np.asarray(cmd_logits))
        step_params.append(np.asarray(param_logits))
    np.testing.assert_allclose(np.stack(step_cmds, 1),
                               np.asarray(roll_cmds), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.stack(step_params, 1),
                               np.asarray(roll_params), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(
        np.argmax(np.stack(step_cmds, 1), -1),
        np.asarray(jnp.argmax(roll_cmds, -1)))


import pytest


@pytest.mark.parametrize("weight_quant", ["int8", "int4"])
def test_export_weight_quant_roundtrip(tmp_path, weight_quant):
    """A weight_quant artifact (w8a16 / w4a16): the rollout program bakes
    the quantized decode in, decode ships quantize.shlo (run once per
    session), and driving the exported incremental pair equals both the
    exported quantized rollout and the live weight_quant rollout."""
    config = dict(TINY_CONFIG)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), f"tiny_{weight_quant}.vcdx")
    meta = export_model(config, params, 1, 6, out, weight_quant=weight_quant)
    assert meta["weight_quant"] == weight_quant
    with zipfile.ZipFile(out) as zf:
        assert "prepare.shlo" in zf.namelist()
    loaded = load_exported(out)

    data = synthetic_batch_feed(1, 6, image_size=32, channels=3, seed=3)
    frames = jnp.asarray(data["frames"])
    cad = jnp.asarray(data["cad_image"])

    live_roll = sequential_inference(model, params, frames, cad,
                                     weight_quant=weight_quant)
    exp_roll = loaded.rollout(frames, cad)
    for a, b in zip(exp_roll, live_roll):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    carry = loaded.decode_init(cad)
    step_cmds = []
    for i in range(frames.shape[1]):
        carry, cmd_logits, _ = loaded.decode_step(frames[:, i], carry)
        step_cmds.append(np.asarray(cmd_logits))
    np.testing.assert_allclose(np.stack(step_cmds, 1),
                               np.asarray(exp_roll[0]), atol=1e-5,
                               rtol=1e-5)


def test_export_cli(tmp_path):
    config_path = os.path.join(str(tmp_path), "configs.json")
    with open(config_path, "w") as f:
        json.dump({"tiny": dict(TINY_CONFIG)}, f)
    out = os.path.join(str(tmp_path), "cli.vcdx")

    from tools.export_model import main
    main(["--model_config", config_path, "--model_name", "tiny",
          "--batch", "1", "--bucket", "5", "--no_rollout", "--out", out])
    loaded = load_exported(out)
    assert loaded.meta["bucket_len"] == 5 and not loaded.meta["has_rollout"]
    data = synthetic_batch_feed(1, 5, image_size=32, channels=3, seed=1)
    cmd, par = loaded.forward(
        jnp.asarray(data["frames"][:, :-1]),
        jnp.asarray(data["actions"][:, :-1], jnp.float32),
        jnp.asarray(data["cad_image"]))
    assert cmd.shape[:2] == (1, 4) and np.isfinite(np.asarray(cmd)).all()
