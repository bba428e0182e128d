"""The int8 quant knob wired through the full model (models/*.py).

Contract: ``quant`` changes numerics only inside the dense matmuls —
the parameter tree (names, shapes, init values) is IDENTICAL across
``quant`` settings, so checkpoints move freely between precision modes,
and the quantized forward tracks the full-precision one closely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.models import create_model, init_model
from videocad_tpu.train import LossConfig, make_train_step
from videocad_tpu.train.state import create_train_state


def _models(quant):
    base = create_model(dict(TINY_CONFIG))
    quantized = create_model(dict(TINY_CONFIG, quant=quant))
    params = init_model(base, jax.random.PRNGKey(0), batch=1, seq_len=4)
    return base, quantized, params


def _batch(seq_len=8):
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, batch=2, seq_len=seq_len)
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestParamCompatibility:
    @pytest.mark.parametrize("quant", ["int8", "int8_bwd"])
    def test_param_trees_identical(self, quant):
        base = create_model(dict(TINY_CONFIG))
        q = create_model(dict(TINY_CONFIG, quant=quant))
        p0 = init_model(base, jax.random.PRNGKey(0), batch=1, seq_len=4)
        p1 = init_model(q, jax.random.PRNGKey(0), batch=1, seq_len=4)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestQuantForward:
    def test_forward_tracks_full_precision(self):
        base, q, params = _models("int8")
        batch = _batch()
        cmds0, params0 = base.apply({"params": params}, batch,
                                    deterministic=True)
        cmds1, params1 = q.apply({"params": params}, batch,
                                 deterministic=True)
        # logits drift from per-layer int8 noise stays small relative to
        # the logit scale
        scale = float(jnp.std(cmds0))
        err = float(jnp.max(jnp.abs(cmds0 - cmds1)))
        assert err < 0.15 * max(scale, 1.0), (err, scale)
        # argmax predictions agree nearly everywhere on random inputs
        agree = float(jnp.mean(
            (jnp.argmax(cmds0, -1) == jnp.argmax(cmds1, -1)).astype(
                jnp.float32)))
        assert agree > 0.9, agree


class TestQuantTraining:
    @pytest.mark.parametrize("quant", ["int8", "int8_bwd"])
    @pytest.mark.slow
    def test_train_step_runs_and_descends(self, quant):
        model = create_model(dict(TINY_CONFIG, quant=quant))
        params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=4)
        state, tx = create_train_state(params, {"lr": 1e-3})
        loss_cfg = LossConfig(cmd_weights=(0.043, 0.029, 0.268, 0.6, 0.059),
                              use_mse=True)
        step = jax.jit(make_train_step(model, tx, loss_cfg))
        batch = _batch()
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, loss, metrics = step(state, batch, jax.random.fold_in(rng, i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        # same batch every step -> the quantized gradients must descend
        assert losses[-1] < losses[0], losses
