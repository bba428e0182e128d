"""Loss functions: class-weighted CE and tolerance-aware "flexible" CE.

Numerically parity-matched to the reference trainer
(/root/reference/trainer.py:822-966) but reformulated for XLA:

* no boolean indexing — ignored / in-tolerance rows are masked out with
  weights so every shape is static;
* the reference builds its tolerance soft-target distribution with a Python
  loop over offsets and index assignment (trainer.py:878-909). After index
  clamping that construction is exactly a uniform distribution over the
  integer interval [lo, hi], so we compute interval membership analytically —
  O(1) per class instead of O(tolerance) scatter ops (tolerance reaches 500).

Parity quirk reproduced by default (SURVEY.md §7 quirk 2): the reference
passes its whole ``above`` list as the ``above`` flag, which is truthy, so
the flexible CE always runs in one-sided ("above") mode for every parameter
while the *accuracy* counters use the correct per-param flag.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight=w, ignore_index=-1) semantics.

    loss = sum_i w[t_i] * nll_i / sum_i w[t_i] over non-ignored rows.
    Returns 0.0 when every row is ignored (the reference would produce NaN
    and skip it behind an isnan guard — trainer.py:961; folding the guard in
    here keeps gradients finite).

    logits: (..., C); targets: (...,) int.
    """
    num_classes = logits.shape[-1]
    logits = logits.reshape(-1, num_classes)
    targets = targets.reshape(-1)
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)

    log_probs = _log_softmax(logits)
    nll = -jnp.take_along_axis(log_probs, safe_targets[:, None], axis=1)[:, 0]

    if class_weights is not None:
        w = class_weights[safe_targets] * valid
    else:
        w = valid.astype(logits.dtype)
    total_w = jnp.sum(w)
    return jnp.where(total_w > 0, jnp.sum(nll * w) / jnp.maximum(total_w, 1e-20), 0.0)


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    shifted = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def tolerance_interval(targets: jnp.ndarray, tolerance: int, above: bool,
                       num_classes: int):
    """The clamped allowed-class interval [lo, hi] for each target.

    above: allowed = {clamp(t + o) : 0 <= o < tolerance}  -> [t, min(t+tol-1, C-1)]
    else:  allowed = {clamp(t + o) : -tol <= o <= tol}    -> [max(t-tol,0), min(t+tol, C-1)]
    """
    if above:
        lo = jnp.clip(targets, 0, num_classes - 1)
        hi = jnp.clip(targets + tolerance - 1, 0, num_classes - 1)
    else:
        lo = jnp.clip(targets - tolerance, 0, num_classes - 1)
        hi = jnp.clip(targets + tolerance, 0, num_classes - 1)
    return lo, hi


def flexible_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    tolerance: int = 2,
    ignore_index: int = -1,
    above: bool = True,
    ignore_valid: bool = True,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Tolerance-aware CE with a uniform soft target over the allowed window.

    Matches reference trainer.py:853-917 exactly:
      * rows whose target is ``ignore_index`` are dropped;
      * with ``ignore_valid``, rows whose argmax prediction already falls in
        the allowed window are dropped too (no gradient for "good enough");
      * remaining rows get CE against a uniform distribution over the
        allowed window; mean over remaining rows; 0.0 when none remain.

    ``above`` defaults to True to reproduce the reference's truthy-list
    quirk (the per-param two-sided flags never reach the loss).
    """
    num_classes = logits.shape[-1]
    logits = logits.reshape(-1, num_classes).astype(jnp.float32)
    targets = targets.reshape(-1)

    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    lo, hi = tolerance_interval(safe_targets, tolerance, above, num_classes)

    preds = jnp.argmax(logits, axis=-1)
    in_window = (preds >= lo) & (preds <= hi)
    sel = valid & (~in_window if ignore_valid else True)

    # Uniform soft target over [lo, hi].
    classes = jnp.arange(num_classes)
    membership = (classes[None, :] >= lo[:, None]) & (classes[None, :] <= hi[:, None])
    soft = membership.astype(jnp.float32)
    soft = soft / jnp.maximum(soft.sum(axis=1, keepdims=True), 1.0)

    log_probs = _log_softmax(logits)
    if class_weights is not None and class_weights.shape[0] == num_classes:
        log_probs = log_probs * class_weights[safe_targets][:, None]
    row_loss = -(soft * log_probs).sum(axis=1)

    n_sel = jnp.sum(sel)
    return jnp.where(
        n_sel > 0,
        jnp.sum(row_loss * sel) / jnp.maximum(n_sel, 1),
        0.0,
    )
