"""Decision transformer family, saliency, attention rollout, ETL converters."""
import pytest

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import TINY_CONFIG, synthetic_batch
from videocad_tpu.infer.interpret import attention_rollout, cad_saliency
from videocad_tpu.models import create_model, init_model


def test_decision_transformer_forward_shapes():
    cfg = dict(TINY_CONFIG, model_family="decision_transformer",
               n_layer=2, n_head=2)
    model = create_model(cfg)
    assert type(model).__name__ == "DecisionTransformer"
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=3)
    data = synthetic_batch(np.random.default_rng(0), 2, 5, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    cmds, params_out = model.apply({"params": params}, batch,
                                   deterministic=True)
    assert cmds.shape == (2, 5, 5)
    assert params_out.shape == (2, 5, 6, 1000)
    cont = model.apply({"params": params}, batch, deterministic=True,
                       continuous=True)
    assert cont.shape == (2, 5, 7)
    assert np.abs(np.asarray(cont)).max() <= 1.0  # tanh head


def test_decision_transformer_is_causal():
    cfg = dict(TINY_CONFIG, model_family="decision_transformer",
               n_layer=2, n_head=2)
    model = create_model(cfg)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=3)
    data = synthetic_batch(np.random.default_rng(0), 1, 6, image_size=32)
    b1 = {k: jnp.asarray(v) for k, v in data.items()}
    actions2 = np.array(data["actions"])
    actions2[:, 4] = [2, 5, 5, -1, -1, 700, -1]
    b2 = dict(b1, actions=jnp.asarray(actions2))
    o1 = model.apply({"params": params}, b1, deterministic=True)[0]
    o2 = model.apply({"params": params}, b2, deterministic=True)[0]
    # state token t sees actions < t only: outputs before t=4 and AT t=4
    # (state_4 precedes a_4 in the stream) unchanged; after t=4 changed
    np.testing.assert_allclose(np.asarray(o1[:, :5]), np.asarray(o2[:, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(o1[:, 5:]), np.asarray(o2[:, 5:]))


@pytest.mark.slow
def test_cad_saliency_shapes_and_signal():
    model = create_model(dict(TINY_CONFIG))
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(1), 2, 4, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    cad, saliency = cad_saliency(model, params, batch)
    assert saliency.shape == (2, 32, 32)
    assert float(jnp.abs(saliency).sum()) > 0  # gradient actually flows


def test_attention_rollout_heatmaps():
    model = create_model(dict(TINY_CONFIG))
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(2), 2, 3, image_size=32)
    heat = attention_rollout(model, params, jnp.asarray(data["cad_image"]))
    assert heat.shape == (2, 32, 32)
    h = np.asarray(heat)
    assert np.isfinite(h).all() and h.min() >= 0


def test_etl_directory_converters(tmp_path):
    from videocad_tpu.etl.dataset_gen import (
        convert_log_dir_to_json,
        json_dir_to_vectors,
    )
    log_dir = tmp_path / "mouse"
    log_dir.mkdir()
    lines = [
        "Scale: 2.0",
        "10 - INFO - finished move to. Absolute (Point(x=1, y=2)) "
        "Relative ((0.1, 0.2)) Args (<obj at 0x1>, 'l')",
        "20 - INFO - finished click. Absolute (Point(x=1, y=2)) "
        "Relative ((0.1, 0.2)) Args (<obj at 0x1>)",
        # end-sentinel: ('shift', 0) chord would be code 17*50=850; use a
        # press keys with args that map to code 19*50=950 -> ('shift','7')
        "30 - INFO - finished press keys. Absolute (Point(x=1, y=2)) "
        "Relative ((0.1, 0.2)) Args (<obj at 0x1>, 'shift', '7')",
    ]
    (log_dir / "0001.log").write_text("\n".join(lines))
    json_dir = tmp_path / "json"
    convert_log_dir_to_json(str(log_dir), str(json_dir))
    assert (json_dir / "0001.json").exists()
    vec_dir = tmp_path / "vec"
    written = json_dir_to_vectors(str(json_dir), str(vec_dir))
    assert len(written) == 1
    import pickle
    actions, timesteps = pickle.load(open(written[0], "rb"))
    # truncated at the 950 sentinel (kept), move-to + click before it
    assert actions[-1][3] == 950
    assert actions.shape[1] == 7
    assert (vec_dir / "0001.csv").exists()
