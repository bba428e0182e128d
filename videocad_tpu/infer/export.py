"""Serving export: shape-specialized StableHLO artifacts via jax.export.

The reference has no deployment story beyond "load the torch checkpoint in
the research repo". This module packages a trained model into a single
self-contained artifact a serving host can run without the framework's
model code:

  <name>.vcdx  (a zip)
    config.json       model config (the reference model_configs schema)
    meta.json         shapes, dtypes, jax version, artifact format version
    params.npz        parameters, flattened by '/'-joined tree path
    forward.shlo      serialized teacher-forced forward (jax.export)
    rollout.shlo      serialized 186-step autoregressive rollout (optional)
    decode_init.shlo  serialized serving-session init: CAD image -> carry
    decode_step.shlo  serialized one-frame incremental decode step
                      (optional; models with action feedback only)
    prepare.shlo      once-per-session decode weight prep (compute-dtype
                      cast + fused q/k/v; int8 for weight_quant='int8')
    mux_init.shlo     lane-multiplexed serving trio (optional, lanes=N
    mux_open.shlo     exports): idle-carry allocator, per-session lane
    mux_step.shlo     claim, and the multiplexed decode tick — multi-
                      session continuous batching with no model code

Exported functions are SHAPE-SPECIALIZED (batch size and padded sequence
bucket are baked in — the same static-shape discipline the training stack
uses); export one artifact per serving configuration. The functions take
(params, inputs) so the weights stay a separate, swappable payload inside
the artifact.

Round-trip fidelity is test-enforced (tests/test_export.py): a loaded
artifact's forward and rollout match the live model bit-for-bit on the
export backend.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 3


def _flatten_params(params: Dict) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        parts = []
        for p in path:
            # The npz key format round-trips nested STRING-KEYED dicts
            # only (flax param trees). A list/tuple node or a '/' in a key
            # would unflatten into a different pytree structure and fail
            # deep inside .call — reject it here with the reason instead.
            key = getattr(p, "key", None)
            if not isinstance(key, str) or "/" in key:
                raise ValueError(
                    "params.npz serialization supports nested dicts with "
                    f"'/'-free string keys only; got path element {p!r} "
                    f"in {jax.tree_util.keystr(path)}")
            parts.append(key)
        out["/".join(parts)] = np.asarray(leaf)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    params: Dict[str, Any] = {}
    for key, value in flat.items():
        node = params
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return params


def export_model(config: Dict[str, Any], params: Dict, batch_size: int,
                 bucket_len: int, out_path: str,
                 with_rollout: bool = True,
                 weight_quant: str = "none",
                 lanes: int = 0) -> Dict[str, Any]:
    """Serialize the model into a .vcdx artifact; returns the meta dict.

    config: a model_configs-style dict; params: the flax param pytree;
    batch_size/bucket_len: the serving shapes to specialize for (the
    forward consumes the teacher-shifted T = bucket_len - 1 frames, the
    rollout consumes bucket_len frames — matching train/steps.py and
    infer/rollout.py).

    weight_quant='int8' bakes the w8a16 decode mode into the artifact:
    the rollout program quantizes the decoder once per call (amortized
    over the scan), and the incremental pair ships with an extra
    ``quantize.shlo`` program the loader runs ONCE per serving session so
    every ``decode_step`` streams int8 decoder weights (measured +21%
    rollout actions/s on v5e — docs/PERF.md). ``params.npz`` stays full
    precision (it is the checkpoint of record).

    lanes=N additionally exports the lane-multiplexed serving trio
    (``mux_init.shlo`` / ``mux_open.shlo`` / ``mux_step.shlo`` — the
    programs of infer/multiplex.py specialized to N lanes), so a host with
    no model code serves N concurrent sessions with continuous batching
    through :class:`~videocad_tpu.infer.server.ArtifactMuxEngine`.
    """
    from jax import export as jax_export

    from videocad_tpu.actions.vocab import ACT_DIM
    from videocad_tpu.infer.rollout import (prepare_for_decode,
                                            quantize_for_decode,
                                            sequential_inference)
    from videocad_tpu.models import create_model

    model = create_model(config)
    cfg = model.config
    if weight_quant not in ("none", "int8", "int4"):
        raise ValueError(f"unknown weight_quant '{weight_quant}' "
                         "(expected 'none', 'int8' or 'int4')")
    if weight_quant != "none" and not cfg.enable_past_actions:
        raise ValueError(
            f"weight_quant='{weight_quant}' requires action feedback "
            "(enable_past_actions): this config has no decode loop to "
            "quantize, so the artifact would be mislabeled")
    t = bucket_len - 1
    img = (cfg.image_size, cfg.image_size, 3)
    frames_spec = jax.ShapeDtypeStruct((batch_size, t) + img, jnp.uint8)
    cad_hw = (256, 256, 3) if cfg.use_pretrained_cad_model else img
    cad_spec = jax.ShapeDtypeStruct((batch_size,) + cad_hw, jnp.uint8)
    actions_spec = jax.ShapeDtypeStruct((batch_size, t, ACT_DIM),
                                        jnp.float32)
    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    # Multiview models take the view stack in EVERY exported program —
    # encode_cad_stream silently skips views when handed None, so leaving
    # multiview out of forward/rollout/decode_init would export programs
    # whose predictions diverge from training-time eval (and from the mux
    # trio in the same artifact).
    multiview = cfg.num_views > 0
    mv_batch_spec = (jax.ShapeDtypeStruct(
        (batch_size, cfg.num_views) + img, jnp.uint8) if multiview else None)

    if multiview:
        def forward(p, frames, actions, cad_image, multiview_images):
            inputs = {"frames": frames, "actions": actions,
                      "cad_image": cad_image,
                      "multiview_images": multiview_images}
            return model.apply({"params": p}, inputs, deterministic=True)

        fwd_exp = jax_export.export(jax.jit(forward))(
            params_spec, frames_spec, actions_spec, cad_spec, mv_batch_spec)
    else:
        def forward(p, frames, actions, cad_image):
            inputs = {"frames": frames, "actions": actions,
                      "cad_image": cad_image}
            return model.apply({"params": p}, inputs, deterministic=True)

        fwd_exp = jax_export.export(jax.jit(forward))(
            params_spec, frames_spec, actions_spec, cad_spec)

    roll_exp = None
    if with_rollout:
        roll_frames = jax.ShapeDtypeStruct((batch_size, bucket_len) + img,
                                           jnp.uint8)

        if multiview:
            def rollout(p, frames, cad_image, multiview_images):
                return sequential_inference(
                    model, p, frames, cad_image,
                    multiview_images=multiview_images,
                    weight_quant=weight_quant)

            roll_exp = jax_export.export(jax.jit(rollout))(
                params_spec, roll_frames, cad_spec, mv_batch_spec)
        else:
            def rollout(p, frames, cad_image):
                return sequential_inference(model, p, frames, cad_image,
                                            weight_quant=weight_quant)

            roll_exp = jax_export.export(jax.jit(rollout))(
                params_spec, roll_frames, cad_spec)

    # Incremental serving pair (frame-at-a-time decode; models with action
    # feedback only — the others are a single forward).
    init_exp = step_exp = quant_exp = None
    if cfg.enable_past_actions:
        from videocad_tpu.infer.incremental import (
            incremental_decode_step, init_decode_carry)

        # Session prep runs ONCE per serving session on the loader side:
        # compute-dtype cast + fused q/k/v (and int8 quantization when
        # requested). Without it every decode_step call would re-cast the
        # full f32 decoder in-program — a whole-decoder HBM re-stream per
        # frame on bf16 models.
        if weight_quant in ("int8", "int4"):
            def prepare(p):
                return quantize_for_decode(
                    p, cfg.compute_dtype,
                    bits=8 if weight_quant == "int8" else 4)
        else:
            def prepare(p):
                return prepare_for_decode(p, cfg.compute_dtype)

        quant_exp = jax_export.export(jax.jit(prepare))(params_spec)
        session_spec = jax.eval_shape(prepare, params_spec)

        def decode_step(p, frame, carry):
            return incremental_decode_step(model, p, frame, carry)

        frame_spec = jax.ShapeDtypeStruct((batch_size,) + img, jnp.uint8)
        if multiview:
            def decode_init(p, cad_image, multiview_images):
                return init_decode_carry(model, p, cad_image, bucket_len,
                                         multiview_images=multiview_images)

            carry_spec = jax.eval_shape(decode_init, session_spec, cad_spec,
                                        mv_batch_spec)
            init_exp = jax_export.export(jax.jit(decode_init))(
                session_spec, cad_spec, mv_batch_spec)
        else:
            def decode_init(p, cad_image):
                return init_decode_carry(model, p, cad_image, bucket_len)

            carry_spec = jax.eval_shape(decode_init, session_spec, cad_spec)
            init_exp = jax_export.export(jax.jit(decode_init))(
                session_spec, cad_spec)
        step_exp = jax_export.export(jax.jit(decode_step))(
            session_spec, frame_spec, carry_spec)

    mux_init_exp = mux_open_exp = mux_step_exp = None
    if lanes > 0:
        if not cfg.enable_past_actions:
            raise ValueError(
                "lanes > 0 exports the mux serving programs, which need "
                "action feedback (enable_past_actions)")
        from videocad_tpu.infer.multiplex import (init_mux_carry,
                                                  mux_decode_step, open_lane)

        # The mux carry is all-zeros by construction — export a no-input
        # allocator from its eval_shape rather than tracing the host-side
        # init_mux_carry (which only needs shapes anyway).
        mux_carry_spec = jax.eval_shape(
            lambda p: init_mux_carry(model, p, lanes, bucket_len,
                                     multiview=multiview), session_spec)

        def mux_init():
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), mux_carry_spec)

        lane_spec = jax.ShapeDtypeStruct((), jnp.int32)
        cad1_spec = jax.ShapeDtypeStruct((1,) + cad_hw, jnp.uint8)
        lane_frames_spec = jax.ShapeDtypeStruct((lanes,) + img, jnp.uint8)
        active_spec = jax.ShapeDtypeStruct((lanes,), jnp.bool_)

        if multiview:
            mv_spec = jax.ShapeDtypeStruct(
                (1, cfg.num_views) + img, jnp.uint8)

            def mux_open(p, carry, lane, cad_image, multiview_images):
                return open_lane(model, p, carry, lane, cad_image,
                                 multiview_images)

            mux_open_exp = jax_export.export(jax.jit(mux_open))(
                session_spec, mux_carry_spec, lane_spec, cad1_spec, mv_spec)
        else:
            def mux_open(p, carry, lane, cad_image):
                return open_lane(model, p, carry, lane, cad_image)

            mux_open_exp = jax_export.export(jax.jit(mux_open))(
                session_spec, mux_carry_spec, lane_spec, cad1_spec)

        def mux_step(p, frames, active, carry):
            return mux_decode_step(model, p, frames, active, carry)

        mux_init_exp = jax_export.export(jax.jit(mux_init))()
        mux_step_exp = jax_export.export(jax.jit(mux_step))(
            session_spec, lane_frames_spec, active_spec, mux_carry_spec)

    meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "batch_size": batch_size,
        "bucket_len": bucket_len,
        "image_size": cfg.image_size,
        "export_platforms": list(fwd_exp.platforms),
        "has_rollout": with_rollout,
        "has_decode": step_exp is not None,
        "weight_quant": weight_quant,
        "multiview": multiview,
        "num_views": cfg.num_views,
        "mux_lanes": lanes if mux_step_exp is not None else 0,
        "mux_multiview": bool(lanes and multiview),
    }
    flat = _flatten_params(params)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("config.json", json.dumps(config, indent=2))
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        zf.writestr("params.npz", buf.getvalue())
        zf.writestr("forward.shlo", fwd_exp.serialize())
        if roll_exp is not None:
            zf.writestr("rollout.shlo", roll_exp.serialize())
        if step_exp is not None:
            zf.writestr("decode_init.shlo", init_exp.serialize())
            zf.writestr("decode_step.shlo", step_exp.serialize())
        if quant_exp is not None:
            zf.writestr("prepare.shlo", quant_exp.serialize())
        if mux_step_exp is not None:
            zf.writestr("mux_init.shlo", mux_init_exp.serialize())
            zf.writestr("mux_open.shlo", mux_open_exp.serialize())
            zf.writestr("mux_step.shlo", mux_step_exp.serialize())
    return meta


class ExportedModel:
    """A loaded .vcdx artifact; runs without the framework's model code."""

    def __init__(self, config: Dict, meta: Dict, params: Dict,
                 forward_exp, rollout_exp, decode_init_exp=None,
                 decode_step_exp=None, quantize_exp=None,
                 mux_init_exp=None, mux_open_exp=None, mux_step_exp=None):
        self.config = config
        self.meta = meta
        self.params = params
        self._forward = forward_exp
        self._rollout = rollout_exp
        self._decode_init = decode_init_exp
        self._decode_step = decode_step_exp
        self._quantize = quantize_exp
        self._mux_init = mux_init_exp
        self._mux_open = mux_open_exp
        self._mux_step = mux_step_exp
        self._session_params = None

    def _decode_params(self):
        """Weights the incremental pair streams: the session tree produced
        by the shipped ``prepare.shlo`` program (compute-dtype cast +
        fused q/k/v, int8-quantized for weight_quant artifacts), computed
        once and cached for the life of this loaded model — per-session
        prep; doing it per step would re-stream the f32 weights every
        frame."""
        if self._session_params is None:
            if self._quantize is not None:
                self._session_params = self._quantize.call(self.params)
            else:
                self._session_params = self.params
        return self._session_params

    def _mv_args(self, multiview_images, flag="multiview") -> Tuple:
        """Arity guard for the optional multiview input: multiview
        artifacts REQUIRE it (their programs were traced with the view
        stack), others must not receive one — both misuses fail here with
        the reason instead of a cryptic pytree arity error from .call."""
        if self.meta.get(flag):
            if multiview_images is None:
                raise ValueError(
                    "this artifact was exported for a multiview model "
                    f"(num_views={self.meta.get('num_views')}); "
                    "multiview_images is required")
            return (multiview_images,)
        if multiview_images is not None:
            raise ValueError("artifact was exported without multiview "
                             "inputs; do not pass multiview_images")
        return ()

    def forward(self, frames, actions, cad_image,
                multiview_images=None) -> Tuple:
        """Teacher-forced forward: (cmd logits, param logits)."""
        return self._forward.call(self.params, frames, actions, cad_image,
                                  *self._mv_args(multiview_images))

    def rollout(self, frames, cad_image, multiview_images=None) -> Tuple:
        """Autoregressive 186-step rollout over ground-truth frames."""
        if self._rollout is None:
            raise ValueError("artifact was exported without a rollout")
        return self._rollout.call(self.params, frames, cad_image,
                                  *self._mv_args(multiview_images))

    def decode_init(self, cad_image, multiview_images=None):
        """Start a serving session: CAD image -> decode carry."""
        if self._decode_init is None:
            raise ValueError(
                "artifact has no incremental decode (exported from a model "
                "without action feedback, or a pre-v2 artifact)")
        return self._decode_init.call(self._decode_params(), cad_image,
                                      *self._mv_args(multiview_images))

    def decode_step(self, frame, carry) -> Tuple:
        """One serving step: the newly observed frame + carry ->
        (new_carry, cmd logits, param logits); drive once per UI frame
        (test-equal to ``rollout`` per step, tests/test_export.py)."""
        if self._decode_step is None:
            raise ValueError(
                "artifact has no incremental decode (exported from a model "
                "without action feedback, or a pre-v2 artifact)")
        return self._decode_step.call(self._decode_params(), frame, carry)

    def _require_mux(self):
        if self._mux_step is None:
            raise ValueError(
                "artifact has no mux serving programs (export with "
                "lanes=N, tools/export_model.py --lanes)")

    def mux_init(self):
        """Allocate the all-lanes-idle mux carry for this artifact's
        ``meta['mux_lanes']`` concurrent sessions."""
        self._require_mux()
        return self._mux_init.call()

    def mux_open(self, carry, lane, cad_image, multiview_images=None):
        """Claim ``lane`` for a new session (batch-1 CAD context encode);
        other lanes' state is untouched."""
        self._require_mux()
        return self._mux_open.call(
            self._decode_params(), carry, lane, cad_image,
            *self._mv_args(multiview_images, flag="mux_multiview"))

    def mux_step(self, frames, active, carry) -> Tuple:
        """One multiplexed tick: per-lane frames (L,H,W,C u8) + active
        mask -> (new_carry, cmd logits (L,5), param logits (L,6,1000));
        inactive lanes are bit-frozen (infer/multiplex.py semantics)."""
        self._require_mux()
        return self._mux_step.call(self._decode_params(), frames, active,
                                   carry)


def load_exported(path: str) -> ExportedModel:
    from jax import export as jax_export

    with zipfile.ZipFile(path, "r") as zf:
        config = json.loads(zf.read("config.json"))
        meta = json.loads(zf.read("meta.json"))
        with np.load(io.BytesIO(zf.read("params.npz"))) as npz:
            params = _unflatten_params({k: npz[k] for k in npz.files})
        fwd = jax_export.deserialize(zf.read("forward.shlo"))
        roll = init = step = quant = None
        if meta.get("has_rollout") and "rollout.shlo" in zf.namelist():
            roll = jax_export.deserialize(zf.read("rollout.shlo"))
        if meta.get("has_decode") and "decode_step.shlo" in zf.namelist():
            init = jax_export.deserialize(zf.read("decode_init.shlo"))
            step = jax_export.deserialize(zf.read("decode_step.shlo"))
        # "quantize.shlo" is the pre-prepare name of the same program
        # (w8a16-only artifacts from earlier r3 exports).
        for member in ("prepare.shlo", "quantize.shlo"):
            if member in zf.namelist():
                quant = jax_export.deserialize(zf.read(member))
                break
        mux_init = mux_open = mux_step = None
        if meta.get("mux_lanes") and "mux_step.shlo" in zf.namelist():
            mux_init = jax_export.deserialize(zf.read("mux_init.shlo"))
            mux_open = jax_export.deserialize(zf.read("mux_open.shlo"))
            mux_step = jax_export.deserialize(zf.read("mux_step.shlo"))
    return ExportedModel(config, meta, params, fwd, roll, init, step, quant,
                         mux_init, mux_open, mux_step)
