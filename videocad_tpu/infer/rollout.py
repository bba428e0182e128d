"""Autoregressive rollout: KV-cached `lax.scan` decode over the 186-step horizon.

Replaces the reference ``sequential_inference``
(/root/reference/model/autoregressive_transformer.py:222-274), which re-runs
a full forward over the growing prefix every step — O(T²) forward passes,
each re-encoding all T frames. Here:

  * ground-truth frames are encoded ONCE (they are inputs to the rollout,
    exactly as in the reference, which slices ``ui_images[:, :t+1]``);
  * cross-attention K/V over the (frame+CAD) memory are projected once per
    layer;
  * the per-step decode is a pure-JAX KV-cached transformer step inside
    ``lax.scan`` — O(T) steps of O(T) attention, no Python in the loop;
    the decoder weights, KV caches and token stream run in the model's
    compute dtype (f32 LayerNorm stats and f32 heads, like the forward),
    and cross-attention reads only the banded ``window_size`` slice of
    the memory K/V per step;
  * predicted actions are argmax-decoded, masked per command
    (apply_action_mask), normalized, and fed back — bit-matching the
    reference's decode rule.

Because the model is strictly causal (causal self-attention, banded
causal memory mask, per-position embeddings), incremental decode is
mathematically identical to the reference's prefix re-forwarding; the
equivalence is asserted in tests/test_rollout.py.

The decode math runs directly on the parameter pytree (Dense/LayerNorm are
two-line ops) — keeping flax's module machinery out of the scan body gives
XLA one flat jaxpr to fuse.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videocad_tpu.actions.ops import apply_action_mask, normalize_actions
from videocad_tpu.actions.vocab import ACT_DIM
from videocad_tpu.models.videocadformer import VideoCADFormer


def _dense(p, x):
    if "kernel_q" in p:
        # Weight-only int8 (w8a16): the int8 kernel streams from HBM at
        # half the bf16 bytes; the cast fuses into the matmul read and the
        # per-output-column scale commutes past the contraction, so the
        # MXU still runs bf16 (the int8 *dot* path measured slower —
        # docs/PERF.md). Decode is weight-streaming-bound, so halving the
        # dominant stream is the win.
        return (x @ p["kernel_q"].astype(x.dtype)) * p["scale"] + p["bias"]
    return x @ p["kernel"] + p["bias"]


_DENSE_KEYS = ("query", "key", "value", "out", "linear1", "linear2")


def quantize_decode_weights(decoder_params: Dict, dtype,
                            bits: int = 8) -> Dict:
    """Per-column symmetric intN quantization of the decoder's dense
    kernels for the scan decode loop (w8a16 / w4a16); everything else
    (LayerNorm affines, biases) is cast to the compute dtype as before.

    bits=4 stores ``jnp.int4`` kernels — XLA packs s4 two-per-byte in TPU
    HBM, so the decode loop's dominant weight stream halves again vs int8
    at the cost of 4-bit per-column rounding (a serving-quality tradeoff;
    the int8 mode is the accuracy-conservative default).
    """
    qmax = {8: 127.0, 4: 7.0}[bits]
    qtype = {8: jnp.int8, 4: jnp.int4}[bits]

    def walk(p, name=None):
        if isinstance(p, dict):
            if name in _DENSE_KEYS and "kernel" in p:
                kern = p["kernel"].astype(jnp.float32)
                scale = jnp.maximum(
                    jnp.max(jnp.abs(kern), axis=0, keepdims=True), 1e-12
                ) / qmax
                q = jnp.clip(jnp.round(kern / scale), -qmax, qmax)
                return {"kernel_q": q.astype(qtype),
                        "scale": scale.astype(dtype),
                        "bias": p["bias"].astype(dtype)}
            return {k: walk(v, k) for k, v in p.items()}
        return p.astype(dtype)
    return walk(decoder_params)


def cast_decode_tree(tree, dtype):
    """Cast a decode param tree to the compute dtype, passing int8/int4
    quantized kernels (``kernel_q``) through untouched — so a tree
    pre-quantized with :func:`quantize_decode_weights` survives the
    rollout/incremental dtype flow."""
    return jax.tree_util.tree_map(
        lambda a: a if a.dtype in (jnp.int8, jnp.int4) else a.astype(dtype),
        tree)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _quantize_for_decode_jit(params: Dict, dtype, bits: int) -> Dict:
    out = dict(params)
    out["decoder"] = fuse_self_qkv(
        quantize_decode_weights(params["decoder"], dtype, bits))
    return out


def quantize_for_decode(params: Dict, dtype, bits: int = 8) -> Dict:
    """Full-params convenience for the incremental serving path: returns
    ``params`` with the decoder subtree intN-quantized (w8a16 / w4a16,
    :func:`quantize_decode_weights`) and its self-attention q/k/v fused
    (:func:`fuse_self_qkv`); encoders, embeddings and heads stay full
    precision. Quantize ONCE per serving session, then drive
    ``incremental_decode_step`` with the result — quantizing per step
    would re-stream the f32 weights and erase the HBM win.

    Runs as ONE compiled program rather than op-by-op: eager int4 ops on
    the TPU backend are broken — the S4 concatenate in
    :func:`fuse_self_qkv` sends eager dispatch into an infinite
    ``device_put`` recursion when it commits the packed-layout operand
    (jax 0.8 ``_array_shard_arg``) — and tracing sidesteps eager S4
    entirely, exactly like the batch-rollout path, which quantizes
    inside ``_rollout_jit`` and never hit this."""
    return _quantize_for_decode_jit(params, jnp.dtype(dtype), int(bits))


def prepare_for_decode(params: Dict, dtype) -> Dict:
    """Full-precision counterpart of :func:`quantize_for_decode`: cast the
    decoder to the compute dtype and fuse its self-attention q/k/v (one
    matmul dispatch instead of three in the latency-bound per-step loop)
    without quantizing. Run once per serving session — it also moves the
    per-step f32->compute-dtype weight cast (a full decoder re-stream per
    incremental call otherwise) to session setup.
    ``incremental_decode_step`` consumes the result unchanged (the shared
    ``decode_step`` detects the fused entry).

    The cross-attention key/value kernels keep their ORIGINAL precision:
    the incremental step projects each new frame's memory K/V with them
    and the batch rollout does that projection with the raw f32 weights
    (then casts) — pre-casting those two would break the step-for-step
    equality contract at bf16 rounding level. They are dead inputs to the
    per-step decoder body, so the uncast leaves cost nothing there."""
    out = dict(params)
    dec = fuse_self_qkv(cast_decode_tree(params["decoder"], dtype))
    for name, layer in params["decoder"].items():
        if not name.startswith("layers_"):
            continue
        ca = dict(dec[name]["cross_attn"])
        ca["key"] = layer["cross_attn"]["key"]
        ca["value"] = layer["cross_attn"]["value"]
        dec[name] = dict(dec[name], cross_attn=ca)
    out["decoder"] = dec
    return out


def fuse_self_qkv(decoder_tree: Dict) -> Dict:
    """Concatenate each layer's self-attention query/key/value kernels
    into one ``qkv`` dense (columnwise — bitwise-identical outputs) so the
    latency-bound decode loop issues one matmul instead of three per
    layer. Works on plain, compute-dtype, and int8-quantized trees (the
    per-column scales concatenate the same way). The original q/k/v
    entries are dropped; ``decode_step`` falls back to them when ``qkv``
    is absent, so unfused callers (the incremental serving path) stay
    step-for-step equal."""
    def fuse(parts, axis):
        keys = parts[0].keys()
        return {k: jnp.concatenate([p[k] for p in parts],
                                   axis if k != "bias" else 0)
                for k in keys}

    out = dict(decoder_tree)
    for name, layer in decoder_tree.items():
        if not name.startswith("layers_") or "qkv" in layer["self_attn"]:
            continue
        sa = dict(layer["self_attn"])
        sa["qkv"] = fuse([sa.pop("query"), sa.pop("key"), sa.pop("value")],
                         axis=1)
        out[name] = dict(layer, self_attn=sa)
    return out


def _layernorm(p, x, eps=1e-5):
    """f32 statistics, affine in the stream dtype — flax nn.LayerNorm's
    dtype flow (stats are promoted to f32 even under bfloat16 compute)."""
    f32 = x.astype(jnp.float32)
    mean = f32.mean(axis=-1, keepdims=True)
    var = ((f32 - mean) ** 2).mean(axis=-1, keepdims=True)
    norm = ((f32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return norm * p["scale"] + p["bias"]


def _heads_split(x, num_heads):
    b, inner = x.shape
    return x.reshape(b, num_heads, inner // num_heads)


def _masked_attend(q, k, v, mask):
    """q: (B,H,D); k,v: (B,S,H,D); mask: (S,) or per-row (B,S) bool.
    -> (B, H*D)."""
    depth = q.shape[-1]
    scores = jnp.einsum("bhd,bshd->bhs", q, k) / jnp.sqrt(
        jnp.asarray(depth, q.dtype))
    mask2d = mask if mask.ndim == 2 else mask[None, :]
    scores = jnp.where(mask2d[:, None, :], scores,
                       jnp.finfo(scores.dtype).min)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhs,bshd->bhd", weights, v)
    b = q.shape[0]
    return ctx.reshape(b, -1)


def _kv_write(cache, new, t):
    """Write one step's K or V into the cache at position ``t``.

    cache: (B,T,H,D); new: (B,H,D); t scalar (shared position — the
    rollout scan / single-session incremental decode) or (B,) (per-lane
    positions — the multiplexed serving step; XLA lowers the vmapped
    ``dynamic_update_slice`` to a scatter)."""
    if t.ndim == 0:
        return jax.lax.dynamic_update_slice(cache, new[:, None],
                                            (0, t, 0, 0))
    return jax.vmap(
        lambda c, n, ti: jax.lax.dynamic_update_slice(c, n[None], (ti, 0, 0))
    )(cache, new, t)


def _window_read(mem, start, w):
    """Banded window read of the memory K/V.

    mem: (B,S,H,D); start scalar (shared window) or (B,) (per-lane
    windows) -> (B,w,H,D)."""
    if start.ndim == 0:
        return jax.lax.dynamic_slice_in_dim(mem, start, w, axis=1)
    return jax.vmap(
        lambda m, s: jax.lax.dynamic_slice_in_dim(m, s, w, axis=0)
    )(mem, start)


def precompute_memory_kv(params: Dict, memory: jnp.ndarray, num_layers: int,
                         num_heads: int):
    """Project cross-attention K/V for every layer once: [(B,S,H,D)] x L."""
    mem_kv = []
    for i in range(num_layers):
        layer = params["decoder"][f"layers_{i}"]["cross_attn"]
        k = _dense(layer["key"], memory)
        v = _dense(layer["value"], memory)
        b, s, inner = k.shape
        mem_kv.append((k.reshape(b, s, num_heads, inner // num_heads),
                       v.reshape(b, s, num_heads, inner // num_heads)))
    return mem_kv


def decode_step(params: Dict, cfg, x: jnp.ndarray, t: jnp.ndarray,
                self_kv: Tuple, mem_kv, window: int, seq_len: int,
                write_valid=None):
    """One decoder-stack step at position ``t``.

    x: (B, hidden) target embedding for this step; self_kv: per-layer
    (k,v) caches (B, T, H, D); returns (hidden_out, new_self_kv).

    ``t`` is either a SCALAR (all rows at the same position — the rollout
    scan and single-session incremental decode) or a PER-ROW (B,) vector
    (each serving lane at its own position — the multiplexed step,
    infer/multiplex.py). The branch is on ``t.ndim``, i.e. static at
    trace time: the scalar path compiles exactly the program it always
    did, and the vector path compiles the per-lane masks/scatter reads
    the lane-multiplexed decoder needs — ONE implementation of the layer
    math for eval and serving (the r4 hand-synced fork is gone).

    Cross-attention reads only a ``window``-wide dynamic slice of the
    memory K/V: the banded mask admits positions (t-window, t], so there
    is no need to stream the full (B, S, H, D) memory per step — at the
    flagship shapes the full-memory reads were ~98 MB/step of the decode
    loop's HBM traffic for a window of 10 valid columns.

    ``write_valid`` (scalar bool, optional, scalar-``t`` callers only):
    when False, the self-KV slot at ``t`` keeps its existing value — the
    horizon guard for incremental callers whose ``t`` may reach seq_len
    (a clamped write would corrupt the final slot). None (the rollout
    scan, whose t < seq_len always) costs nothing. Per-lane callers gate
    every state write outside (multiplex.mux_decode_step's ``active``).
    """
    num_heads = cfg.nhead
    t = jnp.asarray(t)
    per_lane = t.ndim == 1
    if per_lane and write_valid is not None:
        raise ValueError("write_valid is a scalar-t guard; per-lane "
                         "callers gate writes via their active mask")
    positions = jnp.arange(seq_len)
    w = min(window, seq_len)
    start = jnp.clip(t - window + 1, 0, seq_len - w)
    if per_lane:
        self_mask = positions[None, :] <= t[:, None]               # (B, S)
        wpos = start[:, None] + jnp.arange(w)[None, :]             # (B, w)
        mem_mask = (wpos > (t - window)[:, None]) & (wpos <= t[:, None])
    else:
        self_mask = positions <= t                                 # (S,)
        wpos = start + jnp.arange(w)
        mem_mask = (wpos > t - window) & (wpos <= t)

    new_kv = []
    for i in range(cfg.num_decoder_layers):
        layer = params["decoder"][f"layers_{i}"]
        sa, ca = layer["self_attn"], layer["cross_attn"]

        if "qkv" in sa:
            # One fused matmul for q/k/v (fuse_self_qkv): the decode loop
            # is dispatch-latency-bound at small batch, and concatenated
            # columns are bitwise-identical to three separate dots.
            qkv_out = _dense(sa["qkv"], x)
            q, k_t, v_t = (
                _heads_split(part, num_heads)
                for part in jnp.split(qkv_out, 3, axis=-1))
        else:
            q = _heads_split(_dense(sa["query"], x), num_heads)
            k_t = _heads_split(_dense(sa["key"], x), num_heads)
            v_t = _heads_split(_dense(sa["value"], x), num_heads)
        k_cache, v_cache = self_kv[i]
        if write_valid is not None:
            k_t = jnp.where(write_valid, k_t[:, None], jax.lax.dynamic_slice(
                k_cache, (0, t, 0, 0), k_t[:, None].shape))[:, 0]
            v_t = jnp.where(write_valid, v_t[:, None], jax.lax.dynamic_slice(
                v_cache, (0, t, 0, 0), v_t[:, None].shape))[:, 0]
        k_cache = _kv_write(k_cache, k_t, t)
        v_cache = _kv_write(v_cache, v_t, t)
        new_kv.append((k_cache, v_cache))

        ctx = _masked_attend(q, k_cache, v_cache, self_mask)
        x = _layernorm(layer["norm1"], x + _dense(sa["out"], ctx))

        qc = _heads_split(_dense(ca["query"], x), num_heads)
        mem_k, mem_v = mem_kv[i]
        ctx = _masked_attend(qc, _window_read(mem_k, start, w),
                             _window_read(mem_v, start, w), mem_mask)
        x = _layernorm(layer["norm2"], x + _dense(ca["out"], ctx))

        h = jax.nn.relu(_dense(layer["linear1"], x))
        x = _layernorm(layer["norm3"], x + _dense(layer["linear2"], h))
    return x, new_kv


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _rollout_jit(model: VideoCADFormer, params: Dict, frames, cad_image,
                 use_actions: bool, seq_len: int, weight_quant: str = "none",
                 multiview_images=None):
    cfg = model.config

    if not cfg.enable_past_actions:
        # Without action feedback the rollout has no sequential dependency:
        # the banded-causal decoder's last-position outputs over prefixes
        # equal the full forward's positions (tested). One pass suffices.
        inputs = {"frames": frames, "cad_image": cad_image,
                  "actions": jnp.zeros((frames.shape[0], seq_len, ACT_DIM),
                                       jnp.float32)}
        if multiview_images is not None:
            inputs["multiview_images"] = multiview_images
        return model.apply({"params": params}, inputs, deterministic=True)

    # Encode frames + CAD (+ views) once — the O(T^2) frame re-encode in the
    # reference collapses to this single pass. (After the early return: the
    # one-pass branch re-encodes inside model.apply, so tracing this there
    # would only inflate the HLO with dead code.)
    memory, _ui_emb = model.apply(
        {"params": params},
        cad_image, frames, multiview_images, seq_len, True,
        method=VideoCADFormer.encode_context)

    # dtype flow mirrors the teacher-forced forward: the decoder stack and
    # embeddings compute in cfg.compute_dtype (flax Dense dtype), LayerNorm
    # statistics and the prediction heads in f32 (the model's heads cast
    # hidden to f32 explicitly). Pre-casting the scan-body weights matters:
    # the decode loop re-reads every decoder weight each of the T steps, so
    # f32 weights double the loop's dominant HBM stream under a bf16 model.
    dtype = cfg.compute_dtype
    cast = functools.partial(jax.tree_util.tree_map,
                             lambda a: a.astype(dtype))
    if weight_quant in ("int8", "int4"):
        scan_params = {"decoder": quantize_decode_weights(
            params["decoder"], dtype,
            bits=8 if weight_quant == "int8" else 4)}
        # Memory K/V projected with the SAME quantized weights the scan
        # body streams — keeps the batch rollout step-for-step equal to the
        # incremental serving path driven with quantize_for_decode(params).
        mem_src = scan_params
    else:
        scan_params = {"decoder": cast(params["decoder"])}
        mem_src = params
    mem_kv = precompute_memory_kv(mem_src, memory.astype(dtype),
                                  cfg.num_decoder_layers, cfg.nhead)
    # Fused q/k/v after the memory precompute (which reads the unfused
    # cross_attn entries); bitwise-identical, one matmul dispatch saved
    # per layer per step in the latency-bound loop.
    scan_params = {"decoder": fuse_self_qkv(scan_params["decoder"])}
    mem_kv = [(k.astype(dtype), v.astype(dtype)) for k, v in mem_kv]

    b = frames.shape[0]
    hd = cfg.hidden_size // cfg.nhead
    init_kv = [
        (jnp.zeros((b, seq_len, cfg.nhead, hd), dtype),
         jnp.zeros((b, seq_len, cfg.nhead, hd), dtype))
        for _ in range(cfg.num_decoder_layers)
    ]

    if cfg.enable_timestep_embedding:
        ts_emb = params["timestep_embedding"]["embedding"][:seq_len]
    else:
        ts_emb = jnp.zeros((seq_len, cfg.hidden_size), jnp.float32)
    ts_emb = ts_emb.astype(dtype)

    embed_action_p = cast(params["embed_action"])
    # One fused (hidden, 5 + 6*1000) head matmul per step instead of two
    # dispatches; columnwise concat => bitwise-identical logits. Heads
    # stay f32 (the model computes logits in f32 regardless of dtype).
    heads_p = {
        "kernel": jnp.concatenate(
            [params["predict_cmd"]["kernel"],
             params["predict_params"]["kernel"]], axis=1),
        "bias": jnp.concatenate(
            [params["predict_cmd"]["bias"],
             params["predict_params"]["bias"]], axis=0),
    }
    num_classes = cfg.num_classes

    def step(carry, t):
        action, self_kv = carry
        x = jnp.tanh(_dense(embed_action_p, action.astype(dtype))
                     + ts_emb[t])
        hidden, self_kv = decode_step(scan_params, cfg, x, t, self_kv,
                                      mem_kv, cfg.window_size, seq_len)
        hidden = hidden.astype(jnp.float32)
        logits = _dense(heads_p, hidden)
        cmd_logits = logits[:, :num_classes]
        param_logits = logits[:, num_classes:].reshape(
            b, cfg.num_params, cfg.num_params_values)

        cmd_pred = jnp.argmax(cmd_logits, axis=-1)
        param_pred = jnp.argmax(param_logits, axis=-1)
        masked = apply_action_mask(cmd_pred, param_pred)
        next_action = jnp.concatenate(
            [cmd_pred[:, None], masked], axis=-1).astype(jnp.float32)
        next_action = normalize_actions(next_action)
        if not use_actions:
            next_action = jnp.zeros_like(next_action)
        return (next_action, self_kv), (cmd_logits, param_logits)

    init_action = jnp.zeros((b, ACT_DIM), jnp.float32)
    # unroll=2 at small batch halves the XLA while-loop bookkeeping per
    # decoded action (the matmuls stay sequential through the action
    # feedback either way; identical math). At large batch each step is
    # compute-dense enough that the doubled loop body only hurts
    # scheduling — measured -3% at B=64, so unroll stays off there.
    unroll = 2 if b <= 16 else 1
    (_, _), (cmds, param_logits) = jax.lax.scan(
        step, (init_action, init_kv), jnp.arange(seq_len), unroll=unroll)
    # scan stacks on axis 0 (time): (T, B, ...) -> (B, T, ...)
    return (jnp.transpose(cmds, (1, 0, 2)),
            jnp.transpose(param_logits, (1, 0, 2, 3)))


def sequential_inference(model: VideoCADFormer, params: Dict,
                         frames: jnp.ndarray, cad_image: jnp.ndarray,
                         action: bool = True,
                         multiview_images: Optional[jnp.ndarray] = None,
                         weight_quant: str = "none"):
    """Step-by-step rollout; reference API
    (autoregressive_transformer.py:222).

    frames: (B, T, H, W, C) ground-truth UI frames; returns
    ((B, T, 5) cmd logits, (B, T, 6, 1000) param logits) — each step's
    last-position logits, exactly the reference's stacked outputs.

    weight_quant='int8' streams the scan-loop decoder weights as int8
    (w8a16, quantize_decode_weights) — a serving mode that halves the
    decode loop's dominant HBM stream at the cost of per-column weight
    rounding in the decoder (memory K/V, embeddings and heads stay
    full-precision). 'int4' (w4a16) halves that stream again — XLA packs
    s4 two-per-byte in TPU HBM — with coarser 4-bit rounding.
    """
    if weight_quant != "none" and not model.config.enable_past_actions:
        raise ValueError(
            f"weight_quant='{weight_quant}' requires action feedback "
            "(enable_past_actions): without it the rollout is a single "
            "full-precision forward and the quantized decode loop never "
            "runs — a quantized metric/artifact for this config would be "
            "mislabeled")
    seq_len = frames.shape[1]
    return _rollout_jit(model, params, frames, cad_image, action, seq_len,
                        weight_quant, multiview_images)
