"""Lane-multiplexed incremental decode: concurrent serving sessions in one batch.

The incremental decoder (infer/incremental.py) drives ONE session per device
program: every lane of the batch shares a single step counter, so all
clients must arrive at t=0 together.  A serving host has the opposite
workload — CAD-agent sessions open and close at arbitrary times, and each
produces one frame at a time.  This module generalizes the decode carry to
**per-lane state** (per-lane step counters, per-lane KV write positions,
per-lane CAD context) so up to ``lanes`` concurrent sessions share one
compiled program and one weight stream per step — continuous batching for
the decode loop.  The decoder weights are read from HBM once per
``mux_decode_step`` regardless of how many lanes are active, so batching
requests multiplies actions/s at serving time the same way batch rollout
does at eval time.

Per-lane mechanics (everything else is the incremental step verbatim):

  * cache writes land at each lane's own ``t`` — a vmapped
    ``dynamic_update_slice`` (XLA lowers it to a scatter);
  * the causal self mask and the banded ``window_size`` memory window are
    computed per lane from its ``t``;
  * an ``active`` mask gates every state write, so a step request for lane
    i leaves all other lanes bit-frozen (their caches, counters, and
    pending actions are untouched).

Lane equality with the single-session path is test-enforced
(tests/test_multiplex.py): interleaved sessions opened at different times
produce, lane for lane, the logits of their own dedicated
``incremental_decode_step`` run.

The reference has no serving path at all — its rollout
(/root/reference/model/autoregressive_transformer.py:222-274) re-forwards
the whole prefix per step and cannot stream frames, let alone multiplex
sessions.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videocad_tpu.actions.ops import apply_action_mask, normalize_actions
from videocad_tpu.actions.vocab import ACT_DIM
from videocad_tpu.infer.incremental import _require_incremental_support
from videocad_tpu.infer.rollout import (
    _dense,
    _kv_write,
    cast_decode_tree,
    decode_step,
)
from videocad_tpu.models.videocadformer import VideoCADFormer


def init_mux_carry(model: VideoCADFormer, params: Dict, lanes: int,
                   seq_len: int,
                   multiview: bool = False) -> Dict:
    """Allocate an all-lanes-idle carry for ``lanes`` concurrent sessions.

    Host-side allocation only (no model compute — sessions bring their CAD
    context via :func:`open_lane`).  The carry pytree:

      t (L,) int32          per-lane step counter
      active (L,) bool      lane occupancy (gates every state write)
      action (L, 7) f32     per-lane previous action (zero-action start)
      cad_stream (L, W)     per-lane constant CAD features
      self_kv / mem_kv      per-layer (L, seq_len, H, D) caches
    """
    cfg = model.config
    _require_incremental_support(cfg)
    dtype = cfg.compute_dtype
    img = (1, cfg.image_size, cfg.image_size, 3)
    cad_shape = ((1, 256, 256, 3) if cfg.use_pretrained_cad_model else img)
    mv_spec = None
    if multiview and cfg.num_views > 0:
        mv_spec = jax.ShapeDtypeStruct((1, cfg.num_views) + img[1:],
                                       jnp.uint8)
    stream_shape = jax.eval_shape(
        lambda c, m: model.apply({"params": params}, c, m, True,
                                 method=VideoCADFormer.encode_cad_stream),
        jax.ShapeDtypeStruct(cad_shape, jnp.uint8), mv_spec)
    hd = cfg.hidden_size // cfg.nhead
    kv = lambda: (jnp.zeros((lanes, seq_len, cfg.nhead, hd), dtype),
                  jnp.zeros((lanes, seq_len, cfg.nhead, hd), dtype))
    return {
        "t": jnp.zeros((lanes,), jnp.int32),
        "active": jnp.zeros((lanes,), bool),
        "action": jnp.zeros((lanes, ACT_DIM), jnp.float32),
        "cad_stream": jnp.zeros((lanes,) + stream_shape.shape[1:],
                                stream_shape.dtype),
        "self_kv": [kv() for _ in range(cfg.num_decoder_layers)],
        "mem_kv": [kv() for _ in range(cfg.num_decoder_layers)],
    }


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def open_lane(model: VideoCADFormer, params: Dict, carry: Dict,
              lane: jnp.ndarray, cad_image: jnp.ndarray,
              multiview_images: Optional[jnp.ndarray] = None) -> Dict:
    """Claim ``lane`` for a new session: encode its CAD context (batch-1,
    once per session) and reset the lane's counters, action, and caches.
    Other lanes' state is untouched — sessions open mid-flight.
    ``carry`` is donated (in-place lane reset); use the returned carry."""
    cfg = model.config
    cad_stream = model.apply(
        {"params": params}, cad_image, multiview_images, True,
        method=VideoCADFormer.encode_cad_stream)            # (1, W)
    zero_kv = lambda c: c.at[lane].set(jnp.zeros(c.shape[1:], c.dtype))
    return {
        "t": carry["t"].at[lane].set(0),
        "active": carry["active"].at[lane].set(True),
        "action": carry["action"].at[lane].set(
            jnp.zeros((ACT_DIM,), jnp.float32)),
        "cad_stream": carry["cad_stream"].at[lane].set(
            cad_stream[0].astype(carry["cad_stream"].dtype)),
        "self_kv": [(zero_kv(k), zero_kv(v)) for k, v in carry["self_kv"]],
        "mem_kv": [(zero_kv(k), zero_kv(v)) for k, v in carry["mem_kv"]],
    }


def close_lane(carry: Dict, lane: int) -> Dict:
    """Release a lane (host-side; the lane's stale state is inert — every
    write is gated on ``active`` and :func:`open_lane` resets it)."""
    return dict(carry, active=carry["active"].at[lane].set(False))


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(4,))
def mux_decode_step(model: VideoCADFormer, params: Dict,
                    frames: jnp.ndarray, active: jnp.ndarray, carry: Dict
                    ) -> Tuple[Dict, jnp.ndarray, jnp.ndarray]:
    """One multiplexed step: each lane in ``active`` observes its row of
    ``frames`` (L,H,W,C u8) and advances one step; inactive lanes are
    bit-frozen.  Returns (new_carry, cmd_logits (L,5), param_logits
    (L,6,1000)) — logits rows of inactive lanes are garbage by contract.
    ``carry`` is donated (in-place KV-cache updates; ~100 MB/step saved at
    flagship shapes) — drop the old reference, use the returned carry.

    The math per active lane is ``incremental_decode_step`` verbatim (same
    dtype flow, same windowed memory reads), so any interleaving of
    ``open_lane``/``mux_decode_step`` calls equals each session's dedicated
    single-session run — asserted in tests/test_multiplex.py.
    """
    cfg = model.config
    _require_incremental_support(cfg)
    dtype = cfg.compute_dtype
    t = carry["t"]
    seq_len = carry["self_kv"][0][0].shape[1]
    lanes = frames.shape[0]
    # Horizon guard: a lane stepped at t >= seq_len must stay bit-frozen
    # (every state write below is gated on ``active``) rather than let the
    # clamped cache write corrupt its final slot.
    active = active & carry["active"] & (t < seq_len)

    # 1. The new frame's memory slot at each lane's own position.
    mem_t = model.apply({"params": params}, frames, t, carry["cad_stream"],
                        True, method=VideoCADFormer.encode_memory_step)
    mem_t = mem_t.astype(dtype)
    cast = functools.partial(jax.tree_util.tree_map,
                             lambda a: a.astype(dtype))
    scan_params = {"decoder": cast_decode_tree(params["decoder"], dtype)}
    gate = active[:, None, None, None]
    mem_kv = []
    for i in range(cfg.num_decoder_layers):
        layer = params["decoder"][f"layers_{i}"]["cross_attn"]
        k_t = _dense(layer["key"], mem_t).astype(dtype).reshape(
            lanes, cfg.nhead, -1)
        v_t = _dense(layer["value"], mem_t).astype(dtype).reshape(
            lanes, cfg.nhead, -1)
        k_cache, v_cache = carry["mem_kv"][i]
        mem_kv.append((
            jnp.where(gate, _kv_write(k_cache, k_t, t), k_cache),
            jnp.where(gate, _kv_write(v_cache, v_t, t), v_cache)))

    # 2. One decoder step on each lane's previous action.
    if cfg.enable_timestep_embedding:
        ts_emb = params["timestep_embedding"]["embedding"][t]   # (L, hidden)
    else:
        ts_emb = jnp.zeros((lanes, cfg.hidden_size), jnp.float32)
    x = jnp.tanh(_dense(cast(params["embed_action"]),
                        carry["action"].astype(dtype))
                 + ts_emb.astype(dtype))
    # The SHARED decoder step (rollout.decode_step) with per-lane t: one
    # implementation of the decode math for eval and serving (the r4
    # hand-synced fork is gone; lane equality pinned in
    # tests/test_multiplex.py).
    hidden, self_kv = decode_step(scan_params, cfg, x, t,
                                  carry["self_kv"], mem_kv,
                                  cfg.window_size, seq_len)
    hidden = hidden.astype(jnp.float32)
    cmd_logits = _dense(params["predict_cmd"], hidden)
    param_logits = _dense(params["predict_params"], hidden).reshape(
        lanes, cfg.num_params, cfg.num_params_values)

    # 3. Reference decode rule, gated per lane.
    cmd_pred = jnp.argmax(cmd_logits, axis=-1)
    param_pred = jnp.argmax(param_logits, axis=-1)
    masked = apply_action_mask(cmd_pred, param_pred)
    next_action = normalize_actions(jnp.concatenate(
        [cmd_pred[:, None], masked], axis=-1).astype(jnp.float32))

    freeze = lambda new, old: jnp.where(gate, new, old)
    new_carry = dict(
        carry,
        t=jnp.where(active, t + 1, t),
        action=jnp.where(active[:, None], next_action, carry["action"]),
        self_kv=[(freeze(nk, ok), freeze(nv, ov))
                 for (nk, nv), (ok, ov) in zip(self_kv, carry["self_kv"])],
        mem_kv=mem_kv,
    )
    return new_carry, cmd_logits, param_logits
