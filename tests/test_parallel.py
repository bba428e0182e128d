"""SPMD: dp x tp mesh over 8 virtual CPU devices; parity vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.models import create_model, init_model
from videocad_tpu.parallel import (
    MODEL_AXIS,
    create_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from videocad_tpu.train import LossConfig, make_train_step
from videocad_tpu.train.state import create_sharded_train_state, create_train_state

CMD_WEIGHTS = (0.043, 0.029, 0.268, 0.6, 0.059)
LOSS_CFG = LossConfig(cmd_weights=CMD_WEIGHTS, use_mse=True)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "tests need 8 virtual CPU devices"
    model = create_model(dict(TINY_CONFIG))
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(5), 8, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    return model, params, batch


def test_tp_rules_shard_decoder_kernels(setup):
    model, params, _ = setup
    mesh = create_mesh(4, 2)
    shardings = param_shardings(mesh, params)
    qspec = shardings["decoder"]["layers_0"]["self_attn"]["query"]["kernel"].spec
    assert qspec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    ospec = shardings["decoder"]["layers_0"]["self_attn"]["out"]["kernel"].spec
    assert ospec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    hspec = shardings["predict_params"]["kernel"].spec
    assert hspec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    # embeddings replicated
    espec = shardings["embed_action"]["kernel"].spec
    assert espec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_dp_tp_train_step_matches_single_device(setup):
    model, params, batch = setup
    rng = jax.random.PRNGKey(7)

    # single-device reference
    state1, tx1 = create_train_state(params, {"lr": 1e-3})
    step1 = jax.jit(make_train_step(model, tx1, LOSS_CFG))
    _, loss1, metrics1 = step1(state1, batch, rng)

    # 4x2 dp x tp
    mesh = create_mesh(4, 2)
    state2, tx2 = create_sharded_train_state(params, {"lr": 1e-3}, mesh)
    sharded_batch = shard_batch(mesh, batch)
    step2 = jax.jit(make_train_step(model, tx2, LOSS_CFG))
    new_state, loss2, metrics2 = step2(state2, sharded_batch, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    assert float(metrics1["total_predictions"]) == float(
        metrics2["total_predictions"])
    np.testing.assert_allclose(
        float(metrics1["correct_predictions"]),
        float(metrics2["correct_predictions"]), atol=1.0)
    # sharded update stays sharded (no silent full replication of TP params)
    out_spec = new_state.params["decoder"]["layers_0"]["self_attn"][
        "query"]["kernel"].sharding.spec
    assert out_spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


@pytest.mark.slow
def test_hybrid_dcn_mesh_matches_single_device(setup):
    """Multi-slice layout: a (dcn=2, data=2, model=2) hybrid mesh — batch
    sharded jointly over (dcn, data), TP over model — produces the same
    loss/metrics as one device. On real hardware the dcn axis crosses
    slices (DCN); on the virtual CPU mesh the program semantics are
    identical, which is what this asserts."""
    from videocad_tpu.parallel import DCN_AXIS, create_hybrid_mesh

    model, params, batch = setup
    rng = jax.random.PRNGKey(7)

    state1, tx1 = create_train_state(params, {"lr": 1e-3})
    step1 = jax.jit(make_train_step(model, tx1, LOSS_CFG))
    _, loss1, metrics1 = step1(state1, batch, rng)

    mesh = create_hybrid_mesh(2, 2, 2)
    assert mesh.axis_names == (DCN_AXIS, "data", "model")
    state2, tx2 = create_sharded_train_state(params, {"lr": 1e-3}, mesh)
    sharded_batch = shard_batch(mesh, batch)
    # batch rows spread over all four (dcn, data) shards
    spec = sharded_batch["frames"].sharding.spec
    assert spec == jax.sharding.PartitionSpec((DCN_AXIS, "data"))
    step2 = jax.jit(make_train_step(model, tx2, LOSS_CFG))
    new_state, loss2, metrics2 = step2(state2, sharded_batch, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    assert float(metrics1["total_predictions"]) == float(
        metrics2["total_predictions"])
    out_spec = new_state.params["decoder"]["layers_0"]["self_attn"][
        "query"]["kernel"].sharding.spec
    assert out_spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


@pytest.mark.slow
def test_pure_dp_mesh_runs(setup):
    model, params, batch = setup
    mesh = create_mesh(8, 1)
    state, tx = create_sharded_train_state(params, {"lr": 1e-3}, mesh)
    step = jax.jit(make_train_step(model, tx, LOSS_CFG))
    _, loss, _ = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_shard_params_places_leaves(setup):
    model, params, _ = setup
    mesh = create_mesh(4, 2)
    sharded = shard_params(mesh, params)
    leaf = sharded["decoder"]["layers_0"]["linear1"]["kernel"]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


@pytest.mark.slow
def test_block_kernels_under_dp_tp_mesh():
    """The fused block kernels (ops/fused_block.py) run under a dp x tp
    mesh: the pallas custom-calls have no partitioning rules, so XLA must
    gather their operands — correctness (vs the XLA impl on the same mesh)
    is what this asserts."""
    model_b = create_model(dict(TINY_CONFIG, vit_attention_impl="block"))
    model_x = create_model(dict(TINY_CONFIG))
    params = init_model(model_x, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(9), 8, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    rng = jax.random.PRNGKey(3)

    mesh = create_mesh(4, 2)
    losses = {}
    for name, model in (("block", model_b), ("xla", model_x)):
        state, tx = create_sharded_train_state(params, {"lr": 1e-3}, mesh)
        step = jax.jit(make_train_step(model, tx, LOSS_CFG))
        _, loss, metrics = step(state, shard_batch(mesh, batch), rng)
        assert np.isfinite(float(loss))
        assert float(metrics["total_predictions"]) > 0
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["block"], losses["xla"], rtol=2e-4)
