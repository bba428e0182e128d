"""Incremental (frame-at-a-time) decode for serving.

The batch rollout (infer/rollout.py) consumes all ground-truth frames
upfront — fine for evaluation, wrong for a live CAD-UI agent that receives
frames step-by-step as its actions execute. This module factors the scan
body into an explicit-carry step a host can drive once per arriving frame:

  carry = init_decode_carry(model, params, cad_image, seq_len)
  for t, frame in enumerate(ui_stream):          # frames arrive one by one
      carry, cmd_logits, param_logits = incremental_decode_step(
          model, params, frame, carry)
      # carry["action"] now holds the masked/normalized action the agent
      # should execute next (the reference decode rule)

Per step it (1) encodes the new frame and appends its memory K/V slot to
every layer's cross-attention cache, (2) runs one KV-cached decoder step on
the previous action, (3) argmax-decodes, masks and normalizes the next
action. The math is the rollout scan body verbatim (same dtype flow, same
windowed memory reads), so driving T steps equals the batch rollout —
asserted in tests/test_incremental_decode.py and round-trip-tested through
the .vcdx export (infer/export.py, ``ExportedModel.decode_step``).

Reference capability transcended: autoregressive_transformer.py:222-274
re-forwards the growing prefix and cannot stream frames at all.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videocad_tpu.actions.ops import apply_action_mask, normalize_actions
from videocad_tpu.actions.vocab import ACT_DIM
from videocad_tpu.infer.rollout import _dense, cast_decode_tree, decode_step
from videocad_tpu.models.videocadformer import VideoCADFormer


def _require_incremental_support(cfg):
    if not cfg.enable_past_actions:
        raise ValueError(
            "incremental decode needs enable_past_actions=True: without "
            "action feedback the model has no sequential dependency — use "
            "the one-pass forward (infer/rollout.py handles this mode)")


def init_decode_carry(model: VideoCADFormer, params: Dict,
                      cad_image: jnp.ndarray, seq_len: int,
                      multiview_images: Optional[jnp.ndarray] = None) -> Dict:
    """Encode the CAD context once and allocate the decode caches.

    Returns the carry pytree: step counter ``t``, previous ``action``
    (zeros — the reference's zero-action start), the constant
    ``cad_stream`` features, and per-layer self/memory K/V caches sized for
    ``seq_len`` steps.
    """
    cfg = model.config
    _require_incremental_support(cfg)
    dtype = cfg.compute_dtype
    cad_stream = model.apply(
        {"params": params}, cad_image, multiview_images, True,
        method=VideoCADFormer.encode_cad_stream)
    b = cad_image.shape[0]
    hd = cfg.hidden_size // cfg.nhead
    kv = lambda: (jnp.zeros((b, seq_len, cfg.nhead, hd), dtype),
                  jnp.zeros((b, seq_len, cfg.nhead, hd), dtype))
    return {
        "t": jnp.zeros((), jnp.int32),
        "action": jnp.zeros((b, ACT_DIM), jnp.float32),
        "cad_stream": cad_stream,
        "self_kv": [kv() for _ in range(cfg.num_decoder_layers)],
        "mem_kv": [kv() for _ in range(cfg.num_decoder_layers)],
    }


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def incremental_decode_step(model: VideoCADFormer, params: Dict,
                            frame: jnp.ndarray, carry: Dict
                            ) -> Tuple[Dict, jnp.ndarray, jnp.ndarray]:
    """One serving step: observe ``frame`` (B,H,W,C u8), predict an action.

    Returns (new_carry, cmd_logits (B,5), param_logits (B,6,1000));
    ``new_carry["action"]`` is the masked+normalized next action (what the
    batch rollout feeds back), ready to execute in the UI.

    ``carry`` is DONATED: the KV caches are updated in place on device
    (without donation every step would copy the full self+memory caches —
    ~100 MB/step at flagship shapes). Callers must drop their reference
    and use the returned carry, as the loop above does.
    """
    cfg = model.config
    _require_incremental_support(cfg)
    dtype = cfg.compute_dtype
    seq_len = carry["self_kv"][0][0].shape[1]
    b = frame.shape[0]
    # Horizon guard: a step at t >= seq_len would otherwise CLAMP its
    # dynamic_update_slice writes onto the final cache slot, silently
    # corrupting step seq_len-1's state for any caller that overruns the
    # documented loop. Past the horizon the carry is bit-frozen (t, action
    # and every cache unchanged); the returned logits are garbage by
    # contract, like an inactive mux lane's.
    valid = carry["t"] < seq_len
    t = jnp.minimum(carry["t"], seq_len - 1)

    # 1. The new frame's memory slot, appended to every layer's
    #    cross-attention K/V cache (the "memory-KV append").
    mem_t = model.apply({"params": params}, frame, t, carry["cad_stream"],
                        True, method=VideoCADFormer.encode_memory_step)
    mem_t = mem_t.astype(dtype)
    cast = functools.partial(jax.tree_util.tree_map,
                             lambda a: a.astype(dtype))
    # int8-preserving cast: a decoder pre-quantized once per session with
    # rollout.quantize_for_decode streams w8a16 here too (the serving
    # counterpart of sequential_inference(weight_quant='int8')).
    scan_params = {"decoder": cast_decode_tree(params["decoder"], dtype)}
    mem_kv = []
    for i in range(cfg.num_decoder_layers):
        # K/V projected with the raw (f32) weights, then cast — exactly
        # precompute_memory_kv's dtype flow, so incremental == batch
        # rollout under bf16 too.
        layer = params["decoder"][f"layers_{i}"]["cross_attn"]
        k_t = _dense(layer["key"], mem_t).astype(dtype).reshape(
            b, 1, cfg.nhead, -1)
        v_t = _dense(layer["value"], mem_t).astype(dtype).reshape(
            b, 1, cfg.nhead, -1)
        k_cache, v_cache = carry["mem_kv"][i]
        k_t = jnp.where(valid, k_t, jax.lax.dynamic_slice(
            k_cache, (0, t, 0, 0), k_t.shape))
        v_t = jnp.where(valid, v_t, jax.lax.dynamic_slice(
            v_cache, (0, t, 0, 0), v_t.shape))
        mem_kv.append((
            jax.lax.dynamic_update_slice(k_cache, k_t, (0, t, 0, 0)),
            jax.lax.dynamic_update_slice(v_cache, v_t, (0, t, 0, 0))))

    # 2. One KV-cached decoder step on the previous action (the rollout
    #    scan body verbatim: same dtype flow, windowed memory reads).
    if cfg.enable_timestep_embedding:
        ts_emb = params["timestep_embedding"]["embedding"][t]
    else:
        ts_emb = jnp.zeros((cfg.hidden_size,), jnp.float32)
    x = jnp.tanh(_dense(cast(params["embed_action"]),
                        carry["action"].astype(dtype))
                 + ts_emb.astype(dtype))
    hidden, self_kv = decode_step(scan_params, cfg, x, t, carry["self_kv"],
                                  mem_kv, cfg.window_size, seq_len,
                                  write_valid=valid)
    hidden = hidden.astype(jnp.float32)
    cmd_logits = _dense(params["predict_cmd"], hidden)
    param_logits = _dense(params["predict_params"], hidden).reshape(
        b, cfg.num_params, cfg.num_params_values)

    # 3. Reference decode rule: argmax, per-command mask, normalize.
    cmd_pred = jnp.argmax(cmd_logits, axis=-1)
    param_pred = jnp.argmax(param_logits, axis=-1)
    masked = apply_action_mask(cmd_pred, param_pred)
    next_action = jnp.concatenate(
        [cmd_pred[:, None], masked], axis=-1).astype(jnp.float32)
    next_action = normalize_actions(next_action)

    new_carry = dict(carry,
                     t=jnp.where(valid, carry["t"] + 1, carry["t"]),
                     action=jnp.where(valid, next_action, carry["action"]),
                     self_kv=self_kv, mem_kv=mem_kv)
    return new_carry, cmd_logits, param_logits
