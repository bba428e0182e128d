"""The training objective + accuracy counters for VideoCADFormer.

Combines the command loss and six per-parameter losses exactly as the
reference ``MultiClassesTrainer.compute_loss`` (/root/reference/trainer.py:
935-1063) and emits the same metric counters, but as a pure jittable
function returning psum-friendly scalar counts (derived percentages are
computed host-side in ``videocad_tpu.train.metrics``).

Two loss modes, selected by ``use_mse`` (reference training default True —
main.py:96):
  * ``use_mse=True``:  flexible tolerance CE per parameter (no class
    weights), scaled by the command-class weight of the parameter's owning
    command;
  * ``use_mse=False``: 1000-bin class-weighted CE per parameter.
Total = 2 * cmd_loss + sum(param losses).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from videocad_tpu.actions.vocab import (
    NUM_BINS,
    NUM_COMMANDS,
    NUM_PARAMS,
    PARAM_ABOVE,
    PARAM_NAMES,
    PARAM_TOLERANCES,
    PARAM_TO_LABEL,
    TOLERANCE,
)
from videocad_tpu.ops.losses import flexible_cross_entropy, weighted_cross_entropy

TOPK = 30  # "top-30": accuracy over the first 30 timesteps (trainer.py:1006)

# The reference's published command-class weights (class_weights.json
# "Label", consumed at /root/reference/trainer.py:822-845). Single source
# of truth — bench.py, __graft_entry__.py and experiment.default_loss_config
# all import this tuple rather than re-declaring it.
REFERENCE_CMD_WEIGHTS = (
    0.04332685213392362, 0.02915898563179938, 0.267566828114559,
    0.6005346809501417, 0.05941265316957628)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (hashable: safe as a jit static arg)."""

    cmd_weights: Tuple[float, ...]  # class_weights.json "Label"
    use_mse: bool = True
    # Reproduce the reference's truthy-`above` quirk: the flexible CE always
    # runs one-sided. Set False to use the per-param PARAM_ABOVE flags.
    above_quirk: bool = True
    # Optional per-param 1000-bin class weights (use_mse=False path). Keyed
    # by param index; None = unweighted.
    param_bin_weights: Optional[Tuple[Tuple[float, ...], ...]] = None

    @staticmethod
    def from_class_weights(weight_data: dict, use_mse: bool = True,
                           above_quirk: bool = True) -> "LossConfig":
        """Build from a class_weights.json-shaped dict."""
        if not isinstance(weight_data.get("Label"), (list, tuple)):
            raise ValueError(
                "class_weights 'Label' must be a list of 5 floats "
                "(reference class_weights.json format), got "
                f"{type(weight_data.get('Label')).__name__}")
        bins = tuple(
            tuple(weight_data[PARAM_NAMES[i + 1]]) if PARAM_NAMES[i + 1] in weight_data else None
            for i in range(NUM_PARAMS)
        )
        return LossConfig(
            cmd_weights=tuple(weight_data["Label"]),
            use_mse=use_mse,
            above_quirk=above_quirk,
            param_bin_weights=bins if not use_mse else None,
        )


def _param_correct_counts(params_pred, params_target, correct_mask, use_mse,
                          t_slice=slice(None)):
    """Per-param correct counts under the tolerance rules (trainer.py:919-1015)."""
    counts = []
    pred = params_pred[:, t_slice]
    tgt = params_target[:, t_slice]
    msk = correct_mask[:, t_slice]
    for i in range(NUM_PARAMS):
        diff = pred[..., i] - tgt[..., i]
        if use_mse:
            if PARAM_ABOVE[i]:
                ok = (diff >= 0) & (diff < PARAM_TOLERANCES[i])
            else:
                ok = jnp.abs(diff) < TOLERANCE
        else:
            ok = jnp.abs(diff) < TOLERANCE
        counts.append(jnp.sum(ok & msk[..., i]))
    return counts


def compute_loss_and_metrics(
    cmd_logits: jnp.ndarray,      # (B, T, 5)
    param_logits: jnp.ndarray,    # (B, T, 6, 1000)
    target_actions: jnp.ndarray,  # (B, T, 7) int (or float; cast like .long())
    config: LossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    targets = target_actions.astype(jnp.int32)
    cmd_target = targets[..., 0]
    params_target = targets[..., 1:]

    cmd_w = jnp.asarray(config.cmd_weights, dtype=jnp.float32)
    loss_cmd = weighted_cross_entropy(cmd_logits, cmd_target, cmd_w)

    loss_params = 0.0
    for i in range(NUM_PARAMS):
        logits_i = param_logits[..., i, :]
        target_i = params_target[..., i]
        if config.use_mse:
            above = True if config.above_quirk else PARAM_ABOVE[i]
            loss_i = flexible_cross_entropy(
                logits_i, target_i,
                tolerance=PARAM_TOLERANCES[i],
                above=above,
                ignore_valid=True,
            )
        else:
            bins = None
            if config.param_bin_weights and config.param_bin_weights[i] is not None:
                bins = jnp.asarray(config.param_bin_weights[i], dtype=jnp.float32)
            loss_i = weighted_cross_entropy(logits_i, target_i, bins)
        # NaN guard mirrors trainer.py:961 (empty selections already yield 0).
        loss_i = jnp.where(jnp.isnan(loss_i), 0.0, loss_i)
        loss_params = loss_params + loss_i * config.cmd_weights[PARAM_TO_LABEL[i]]

    loss = 2.0 * loss_cmd + loss_params

    # ---- accuracy counters (trainer.py:968-1062) ----
    cmd_pred = jnp.argmax(cmd_logits, axis=-1)
    params_pred = jnp.argmax(param_logits, axis=-1)

    cmd_mask = cmd_target != -1
    cmd_correct = jnp.sum((cmd_pred == cmd_target) & cmd_mask)

    metrics: Dict[str, jnp.ndarray] = {}
    for i in range(NUM_COMMANDS):
        mask_i = cmd_target == i
        metrics[f"cmd_corrects_{i}"] = jnp.sum((cmd_pred == cmd_target) & mask_i)
        metrics[f"cmd_counts_{i}"] = jnp.sum(mask_i)

    # param_mask: counted whenever the param is labeled; params_mask (for
    # "correct") additionally requires the command itself to be right.
    param_valid = cmd_mask[..., None] & (params_target != -1)
    params_mask = param_valid & (cmd_pred == cmd_target)[..., None]

    param_corrects = _param_correct_counts(
        params_pred, params_target, params_mask, config.use_mse)
    params_correct_all = 0
    for i in range(NUM_PARAMS):
        metrics[f"param_corrects_{i}"] = param_corrects[i]
        metrics[f"param_counts_{i}"] = jnp.sum(param_valid[..., i])
        params_correct_all = params_correct_all + param_corrects[i]

    metrics["correct_predictions"] = cmd_correct + params_correct_all
    metrics["total_predictions"] = jnp.sum(cmd_mask) + jnp.sum(param_valid)

    # Top-30: the first TOPK timesteps only.
    k = TOPK
    metrics["cmd_correct_topk"] = jnp.sum(
        (cmd_pred[:, :k] == cmd_target[:, :k]) & cmd_mask[:, :k])
    metrics["cmd_counts_topk"] = jnp.sum(cmd_mask[:, :k])
    if config.use_mse:
        topk_corrects = _param_correct_counts(
            params_pred, params_target, params_mask, True, t_slice=slice(0, k))
        metrics["param_correct_topk"] = sum(topk_corrects)
    else:
        # Non-MSE top-30 uses exact equality (trainer.py:1015).
        metrics["param_correct_topk"] = jnp.sum(
            (params_pred[:, :k] == params_target[:, :k]) & params_mask[:, :k])
    metrics["param_counts_topk"] = jnp.sum(param_valid[:, :k])

    # Perfect-sequence counters: always zero in the reference (computation
    # commented out — trainer.py:1021-1038); kept for log-schema parity.
    zero = jnp.zeros((), dtype=jnp.int32)
    metrics["perfect_sequences"] = zero
    metrics["perfect_commands"] = zero
    metrics["total_sequences"] = zero

    metrics = {k_: v.astype(jnp.float32) for k_, v in metrics.items()}
    return loss, metrics
