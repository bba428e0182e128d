"""Numerical parity vs core torch modules through the checkpoint converter.

The decoder is the most conversion-sensitive piece (packed in_proj, post-LN
ordering, mask conventions); converting real torch.nn.TransformerDecoder
weights and matching outputs validates both the converter mapping and the
decoder's torch-semantics claim.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp

from convert_torch_checkpoint import (
    convert_decoder,
    convert_mha,
    linear,
    strip_prefixes,
)
from videocad_tpu.models.layers import TransformerDecoder, banded_mask, causal_mask

D, HEADS, FFW, LAYERS = 32, 2, 48, 2


@pytest.fixture(scope="module")
def torch_decoder():
    torch.manual_seed(0)
    layer = torch.nn.TransformerDecoderLayer(
        d_model=D, nhead=HEADS, dim_feedforward=FFW, dropout=0.0)
    return torch.nn.TransformerDecoder(layer, num_layers=LAYERS).eval()


def _bool_to_additive(mask_bool):
    # torch: float mask with -inf at disallowed positions
    m = np.where(np.asarray(mask_bool), 0.0, float("-inf")).astype(np.float32)
    return torch.tensor(m)


def test_decoder_matches_torch(torch_decoder):
    t, s, b = 7, 7, 3
    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(b, t, D)).astype(np.float32)
    mem = rng.normal(size=(b, s, D)).astype(np.float32)
    tgt_mask = causal_mask(t)
    mem_mask = banded_mask(t, s, 3)

    with torch.no_grad():
        ref = torch_decoder(
            torch.tensor(tgt).permute(1, 0, 2),
            torch.tensor(mem).permute(1, 0, 2),
            tgt_mask=_bool_to_additive(tgt_mask),
            memory_mask=_bool_to_additive(mem_mask),
        ).permute(1, 0, 2).numpy()

    params = {"decoder": convert_decoder(
        torch_decoder.state_dict(), LAYERS, prefix="")}

    model = TransformerDecoder(model_dim=D, num_layers=LAYERS,
                               num_heads=HEADS, ffn_dim=FFW, dropout_rate=0.0)
    out = model.apply({"params": params["decoder"]},
                      jnp.asarray(tgt), jnp.asarray(mem),
                      tgt_mask, mem_mask, True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_mha_conversion_matches_torch():
    torch.manual_seed(1)
    mha = torch.nn.MultiheadAttention(D, HEADS, dropout=0.0).eval()
    t, s, b = 5, 6, 2
    rng = np.random.default_rng(1)
    q = rng.normal(size=(b, t, D)).astype(np.float32)
    kv = rng.normal(size=(b, s, D)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha(torch.tensor(q).permute(1, 0, 2),
                     torch.tensor(kv).permute(1, 0, 2),
                     torch.tensor(kv).permute(1, 0, 2))
    ref = ref.permute(1, 0, 2).numpy()

    sd = {k: v for k, v in mha.state_dict().items()}
    # name the module 'm' to exercise the prefixed lookup
    sd = {f"m.{k}": v for k, v in sd.items()}
    params = convert_mha(sd, "m")

    from videocad_tpu.models.layers import MultiHeadAttention
    module = MultiHeadAttention(model_dim=D, num_heads=HEADS)
    out = module.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_linear_and_prefix_stripping():
    lin = torch.nn.Linear(8, 4)
    sd = {f"module._orig_mod.fc.{k}": v for k, v in lin.state_dict().items()}
    stripped = strip_prefixes(sd)
    params = linear(stripped, "fc")
    x = np.ones((2, 8), np.float32)
    expected = lin(torch.tensor(x)).detach().numpy()
    got = x @ params["kernel"] + params["bias"]
    np.testing.assert_allclose(got, expected, atol=1e-6)
