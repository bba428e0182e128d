"""End-to-end torch-checkpoint parity: a complete reference-shaped
AutoRegressiveTransformer state_dict (torch), converted via
tools/convert_torch_checkpoint, must produce fp32-identical logits through
the ENTIRE forward — ViT encoders + embeddings + decoder + heads.

The torch oracle replicates the reference model exactly from torch
primitives (/root/reference/model/autoregressive_transformer.py:121-220,
trajectory_model.py:53-67, base_transformer.py:52-54), with vit_pytorch's
ViT rebuilt in BOTH naming generations the converter supports:
  * modern:  LN patch embedding, inline attention/FF norms, final norm
  * legacy:  Rearrange/Linear patch embedding, PreNorm wrappers, no final
             norm (it lived in the stripped mlp_head)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_checkpoint import (  # noqa: E402
    convert_state_dict,
    detect_config_overrides,
)
from videocad_tpu.models import create_model  # noqa: E402

# Small but structurally faithful dims.
IMG, PATCH, VDIM, VDEPTH, VHEADS, VHEAD_DIM, VMLP = 32, 16, 64, 2, 4, 16, 96
HIDDEN, NHEAD, FFN, NLAYERS, T, B = 48, 4, 80, 2, 5, 2
MAX_EP = 64

MODEL_CONFIG = dict(
    hidden_size=HIDDEN, num_decoder_layers=NLAYERS, dim_feedforward=FFN,
    nhead=NHEAD, encoder="vit", enable_past_actions=True,
    enable_past_states=True, enable_timestep_embedding=True, window_size=3,
    image_size=IMG, image_channels=1, vit_patch=PATCH, vit_dim=VDIM,
    vit_depth=VDEPTH, vit_heads=VHEADS, vit_head_dim=VHEAD_DIM,
    vit_mlp_dim=VMLP, max_ep_len=MAX_EP, dtype="float32",
)


# ---------------------------------------------------------------------------
# vit_pytorch rebuilt (both generations), state_dict-name compatible
# ---------------------------------------------------------------------------

class _Attention(nn.Module):
    def __init__(self, dim, heads, dim_head, modern):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.modern = heads, dim_head, modern
        self.norm = nn.LayerNorm(dim) if modern else None
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        if self.modern:
            x = self.norm(x)
        b, n, _ = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = [t.reshape(b, n, self.heads, self.dim_head).transpose(1, 2)
                   for t in qkv]
        attn = (q @ k.transpose(-1, -2)) * (self.dim_head ** -0.5)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class _FeedForward(nn.Module):
    def __init__(self, dim, hidden, modern):
        super().__init__()
        if modern:
            self.net = nn.Sequential(
                nn.LayerNorm(dim), nn.Linear(dim, hidden), nn.GELU(),
                nn.Dropout(0.0), nn.Linear(hidden, dim), nn.Dropout(0.0))
        else:
            self.net = nn.Sequential(
                nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(hidden, dim), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class _PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _LegacyAttnWrap(nn.Module):
    """Legacy naming: layers.i.0.norm + layers.i.0.fn.to_qkv."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = _Attention(dim, heads, dim_head, modern=False)

    def forward(self, x):
        return self.fn(self.norm(x))


class _Transformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim, modern):
        super().__init__()
        self.modern = modern
        self.layers = nn.ModuleList()
        for _ in range(depth):
            if modern:
                attn = _Attention(dim, heads, dim_head, modern=True)
                ff = _FeedForward(dim, mlp_dim, modern=True)
            else:
                attn = _LegacyAttnWrap(dim, heads, dim_head)
                ff = _PreNorm(dim, _FeedForward(dim, mlp_dim, modern=False))
            self.layers.append(nn.ModuleList([attn, ff]))
        if modern:
            self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return self.norm(x) if self.modern else x


class TorchViT(nn.Module):
    """vit_pytorch.ViT with mlp_head stripped (trajectory_model.py:53-67)."""

    def __init__(self, modern):
        super().__init__()
        n = (IMG // PATCH) ** 2
        patch_dim = PATCH * PATCH * 1
        if modern:
            self.to_patch_embedding = nn.Sequential(
                nn.Identity(),  # Rearrange slot (index 0)
                nn.LayerNorm(patch_dim), nn.Linear(patch_dim, VDIM),
                nn.LayerNorm(VDIM))
        else:
            self.to_patch_embedding = nn.Sequential(
                nn.Identity(), nn.Linear(patch_dim, VDIM))
        self.pos_embedding = nn.Parameter(torch.randn(1, n + 1, VDIM))
        self.cls_token = nn.Parameter(torch.randn(1, 1, VDIM))
        self.transformer = _Transformer(VDIM, VDEPTH, VHEADS, VHEAD_DIM,
                                        VMLP, modern)

    def forward(self, img):  # img: (B, 1, H, W)
        b, c, h, w = img.shape
        g = h // PATCH
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        x = img.reshape(b, c, g, PATCH, g, PATCH)
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(b, g * g, PATCH * PATCH * c)
        x = self.to_patch_embedding(x)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embedding[:, : g * g + 1]
        x = self.transformer(x)
        return x[:, 0]


class TorchRefModel(nn.Module):
    """The reference AutoRegressiveTransformer wiring, flagship mode
    (past actions + past states + timestep embedding), eval/fp32."""

    def __init__(self, modern_vit):
        super().__init__()
        self.state_embedding_model = TorchViT(modern_vit)
        self.cad_embedding_model = TorchViT(modern_vit)
        self.embed_state = nn.Linear(VDIM, HIDDEN)
        self.embed_image = nn.Linear(VDIM, HIDDEN)
        self.embed_action = nn.Linear(7, HIDDEN)
        self.image_projection = nn.Linear(HIDDEN * 2, HIDDEN)
        self.timestep_embedding = nn.Embedding(MAX_EP, HIDDEN)
        self.transformer_decoder = nn.TransformerDecoder(
            nn.TransformerDecoderLayer(d_model=HIDDEN, nhead=NHEAD,
                                       dim_feedforward=FFN, dropout=0.0),
            num_layers=NLAYERS)
        self.predict_action_class_0_4 = nn.Linear(HIDDEN, 5)
        self.predict_action_class_0_999 = nn.Linear(HIDDEN, 6 * 1000)
        self.window_size = 3

    def forward(self, frames, actions, cad_image):
        b, t = actions.shape[:2]
        ts = self.timestep_embedding(torch.arange(t))
        ui = self.state_embedding_model(frames.reshape(-1, *frames.shape[2:]))
        ui = self.embed_state(ui).reshape(b, t, -1)
        ui = torch.tanh(ui + ts)
        cad = self.embed_image(self.cad_embedding_model(cad_image))
        cad = cad.unsqueeze(1).repeat(1, t, 1)
        combined = torch.tanh(self.image_projection(
            torch.cat([ui, cad], dim=-1)))
        act = torch.tanh(self.embed_action(actions.float()) + ts)

        causal = nn.Transformer.generate_square_subsequent_mask(t)
        band = torch.full((t, t), float("-inf"))
        rows = torch.arange(t)[:, None]
        cols = torch.arange(t)
        band[(cols > (rows - self.window_size)) & (cols <= rows)] = 0.0
        hidden = self.transformer_decoder(
            tgt=act.permute(1, 0, 2), memory=combined.permute(1, 0, 2),
            tgt_mask=causal, memory_mask=band).permute(1, 0, 2)
        cmds = self.predict_action_class_0_4(hidden)
        params = self.predict_action_class_0_999(hidden).reshape(
            b, t, 6, 1000)
        return cmds, params


@pytest.mark.parametrize("modern", [True, False],
                         ids=["modern_vit", "legacy_vit"])
def test_full_model_logits_parity(modern):
    torch.manual_seed(0)
    oracle = TorchRefModel(modern).eval()
    # DDP + compile prefixes, as a released checkpoint would have
    sd = {"module._orig_mod." + k: v for k, v in oracle.state_dict().items()}

    overrides = detect_config_overrides(sd)
    assert overrides == ({} if modern else
                         {"vit_patch_norm": False, "vit_final_norm": False})
    config = dict(MODEL_CONFIG, **overrides)
    params = convert_state_dict(sd, config)
    model = create_model(config)

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((B, T, IMG, IMG, 1)).astype(np.float32)
    cad = rng.standard_normal((B, IMG, IMG, 1)).astype(np.float32)
    actions = (rng.integers(0, 1000, (B, T, 7)) / 1000.0).astype(np.float32)

    with torch.no_grad():
        t_cmds, t_params = oracle(
            torch.from_numpy(frames).permute(0, 1, 4, 2, 3),
            torch.from_numpy(actions),
            torch.from_numpy(cad).permute(0, 3, 1, 2))

    j_cmds, j_params = model.apply(
        {"params": params},
        {"frames": jnp.asarray(frames), "actions": jnp.asarray(actions),
         "cad_image": jnp.asarray(cad)},
        deterministic=True)

    np.testing.assert_allclose(np.asarray(j_cmds), t_cmds.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_params), t_params.numpy(),
                               atol=2e-4, rtol=1e-4)
