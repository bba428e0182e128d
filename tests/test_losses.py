"""Loss parity vs a torch oracle implementing the reference math.

The oracle reproduces /root/reference/trainer.py:822-1063 semantics (soft
targets built with an offset loop + index assignment, boolean-indexed row
drops) so it checks our static-shape, analytic-interval reformulation.
"""

import json

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from videocad_tpu.actions.vocab import (
    NUM_PARAMS,
    PARAM_TOLERANCES,
    PARAM_TO_LABEL,
    TOLERANCE,
)
from videocad_tpu.ops.losses import flexible_cross_entropy, weighted_cross_entropy
from videocad_tpu.train.objective import LossConfig, compute_loss_and_metrics

CMD_WEIGHTS = [0.043, 0.029, 0.268, 0.6, 0.059]


def torch_flexible_ce(logits, targets, num_classes, tolerance, above, ignore_valid):
    """Oracle: the reference flexible_cross_entropy, torch semantics."""
    logits = torch.tensor(logits).reshape(-1, num_classes)
    targets = torch.tensor(targets).reshape(-1)
    mask = targets != -1
    logits, targets = logits[mask], targets[mask]
    if logits.size(0) == 0:
        return 0.0
    preds = torch.argmax(logits, dim=1)
    offsets = range(tolerance) if above else range(-tolerance, tolerance + 1)
    allowed = torch.stack(
        [torch.clamp(targets + o, 0, num_classes - 1) for o in offsets], dim=1)
    is_valid = (allowed == preds.unsqueeze(1)).any(dim=1)
    if ignore_valid:
        logits, targets = logits[~is_valid], targets[~is_valid]
    if logits.size(0) == 0:
        return 0.0
    soft = torch.zeros_like(logits)
    for o in offsets:
        idx = torch.clamp(targets + o, 0, num_classes - 1)
        soft[torch.arange(len(idx)), idx] = 1.0
    soft = soft / soft.sum(dim=1, keepdim=True)
    log_probs = torch.nn.functional.log_softmax(logits, dim=1)
    return float(-(soft * log_probs).sum(dim=1).mean())


@pytest.mark.parametrize("tolerance,above,ignore_valid", [
    (2, True, True), (2, False, True), (50, True, True),
    (200, True, False), (5, False, False), (500, True, True),
])
def test_flexible_ce_matches_oracle(tolerance, above, ignore_valid):
    rng = np.random.default_rng(tolerance)
    n, c = 64, 1000
    logits = rng.normal(size=(n, c)).astype(np.float32)
    targets = rng.integers(-1, c, size=(n,))
    # force some in-window predictions so ignore_valid matters
    targets[:8] = np.argmax(logits[:8], axis=1)
    expected = torch_flexible_ce(logits, targets, c, tolerance, above, ignore_valid)
    got = float(flexible_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets),
        tolerance=tolerance, above=above, ignore_valid=ignore_valid))
    assert abs(got - expected) < 1e-4, (got, expected)


def test_flexible_ce_empty_selection_returns_zero():
    logits = np.zeros((4, 10), dtype=np.float32)
    targets = np.full((4,), -1)
    assert float(flexible_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))) == 0.0


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(0)
    n, c = 200, 5
    logits = rng.normal(size=(n, c)).astype(np.float32)
    targets = rng.integers(-1, c, size=(n,))
    w = np.asarray(CMD_WEIGHTS, dtype=np.float32)
    expected = float(torch.nn.CrossEntropyLoss(
        weight=torch.tensor(w), ignore_index=-1)(
        torch.tensor(logits), torch.tensor(targets)))
    got = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
    assert abs(got - expected) < 1e-5


def _random_batch(rng, b=3, t=20):
    cmd_logits = rng.normal(size=(b, t, 5)).astype(np.float32)
    param_logits = rng.normal(size=(b, t, 6, 1000)).astype(np.float32)
    actions = np.stack([
        rng.integers(0, 5, size=(b, t)),
        *[rng.integers(-1, 1000, size=(b, t)) for _ in range(6)],
    ], axis=-1)
    # pad the tail of one sequence
    actions[0, -5:] = -1
    return cmd_logits, param_logits, actions


def torch_reference_loss(cmd_logits, param_logits, actions, use_mse):
    """Oracle for MultiClassesTrainer.compute_loss's loss value."""
    actions = torch.tensor(actions).long()
    cmd_logits_t = torch.tensor(cmd_logits)
    cmd_target = actions[..., 0]
    params_target = actions[..., 1:]
    w = torch.tensor(CMD_WEIGHTS)
    loss_cmd = torch.nn.CrossEntropyLoss(weight=w, ignore_index=-1)(
        cmd_logits_t.reshape(-1, 5), cmd_target.reshape(-1))
    loss_params = 0.0
    for i in range(NUM_PARAMS):
        if use_mse:
            # reference quirk: `above=self.above` (truthy list) -> always above
            loss_p = torch_flexible_ce(
                param_logits[..., i, :].reshape(-1, 1000),
                actions[..., 1 + i].reshape(-1).numpy(),
                1000, PARAM_TOLERANCES[i], True, True)
        else:
            loss_p = float(torch.nn.CrossEntropyLoss(ignore_index=-1)(
                torch.tensor(param_logits[..., i, :]).reshape(-1, 1000),
                params_target[..., i].reshape(-1)))
        if not np.isnan(loss_p):
            loss_params += loss_p * CMD_WEIGHTS[PARAM_TO_LABEL[i]]
    return float(2 * loss_cmd + loss_params)


@pytest.mark.parametrize("use_mse", [True, False])
def test_total_loss_matches_reference_semantics(use_mse):
    rng = np.random.default_rng(7)
    cmd_logits, param_logits, actions = _random_batch(rng)
    expected = torch_reference_loss(cmd_logits, param_logits, actions, use_mse)
    cfg = LossConfig(cmd_weights=tuple(CMD_WEIGHTS), use_mse=use_mse)
    loss, _ = compute_loss_and_metrics(
        jnp.asarray(cmd_logits), jnp.asarray(param_logits), jnp.asarray(actions), cfg)
    assert abs(float(loss) - expected) < 1e-3, (float(loss), expected)


def test_metric_counters_match_reference_semantics():
    rng = np.random.default_rng(11)
    cmd_logits, param_logits, actions = _random_batch(rng, b=4, t=40)
    cfg = LossConfig(cmd_weights=tuple(CMD_WEIGHTS), use_mse=True)
    _, m = compute_loss_and_metrics(
        jnp.asarray(cmd_logits), jnp.asarray(param_logits), jnp.asarray(actions), cfg)

    # Oracle counters (trainer.py:968-1015), torch semantics.
    a = torch.tensor(actions).long()
    cmd_t, params_t = a[..., 0], a[..., 1:]
    cmd_p = torch.argmax(torch.tensor(cmd_logits), dim=-1)
    params_p = torch.argmax(torch.tensor(param_logits), dim=-1)
    cmd_mask = cmd_t != -1
    param_mask = cmd_mask.unsqueeze(-1) & (params_t != -1)
    params_mask = param_mask & (cmd_p == cmd_t).unsqueeze(-1)

    assert float(m["cmd_corrects_2"]) == float(((cmd_p == cmd_t) & (cmd_t == 2)).sum())
    assert float(m["cmd_counts_2"]) == float((cmd_t == 2).sum())
    for i in range(NUM_PARAMS):
        diff = params_p[..., i] - params_t[..., i]
        if i in (2, 3, 4):  # above params
            ok = (diff >= 0) & (diff < PARAM_TOLERANCES[i])
        else:
            ok = diff.abs() < TOLERANCE
        expected = float((ok & params_mask[..., i]).sum())
        assert float(m[f"param_corrects_{i}"]) == expected, i
        assert float(m[f"param_counts_{i}"]) == float(param_mask[..., i].sum())
    assert float(m["total_predictions"]) == float(cmd_mask.sum() + param_mask.sum())
    # top-30 windows
    assert float(m["cmd_counts_topk"]) == float(cmd_mask[:, :30].sum())
