"""JAX ops over action tensors: normalization and per-command param masking.

Functional equivalents of the reference's model-side helpers
(/root/reference/model/autoregressive_transformer.py:91-118), written for
XLA: pure, no in-place mutation, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from videocad_tpu.actions.vocab import (
    ACTION_PARAM_MASK,
    KEY3_WINDOW_HI,
    KEY3_WINDOW_LO,
    NUM_COMMANDS,
)


def normalize_actions(actions: jnp.ndarray) -> jnp.ndarray:
    """Scale integer actions to model-input floats: cmd/4, params/1000.

    Matches reference trainer.py:800-804 (the out-of-place variant). Input
    shape (..., 7); -1 sentinels become -0.25 / -0.001 exactly as in the
    reference.
    """
    actions = actions.astype(jnp.float32)
    cmd = actions[..., :1] / 4.0
    params = actions[..., 1:] / 1000.0
    return jnp.concatenate([cmd, params], axis=-1)


def param_validity_mask(cmd: jnp.ndarray) -> jnp.ndarray:
    """Per-command param validity, shape cmd.shape + (6,), float {0,1}.

    cmd: integer array of command ids in [0, NUM_COMMANDS).
    """
    table = jnp.asarray(ACTION_PARAM_MASK, dtype=jnp.float32)
    return table[jnp.clip(cmd, 0, NUM_COMMANDS - 1)]


def apply_action_mask(cmd_pred: jnp.ndarray, param_pred: jnp.ndarray) -> jnp.ndarray:
    """Invalidate params not used by the predicted command.

    - params where the command's mask is 0 become -1;
    - param 3 survives only when (already-masked) param 2 lies in
      [KEY3_WINDOW_LO, KEY3_WINDOW_HI) — the repeat-count dependency rule
      (reference autoregressive_transformer.py:91-108).

    cmd_pred: (...,) int; param_pred: (..., 6) int. Returns (..., 6) int.
    """
    mask = param_validity_mask(cmd_pred)
    masked = jnp.where(mask == 0, -1, param_pred)
    key = masked[..., 2]
    times_ok = (key >= KEY3_WINDOW_LO) & (key < KEY3_WINDOW_HI)
    times = jnp.where(times_ok, masked[..., 3], -1)
    return masked.at[..., 3].set(times)
