"""Action vocabulary: the discrete low-level UI action space.

An action is a 7-dim integer vector ``[cmd, x, y, key, times, scroll, typed]``:
  * ``cmd`` in [0, 4]: 0=move-to, 1=press-keys, 2=scroll, 3=type, 4=click
  * six parameters, each discretized to 1000 bins; ``-1`` marks an unused
    parameter (and, in padded batches, padding).

Encoding semantics are bit-compatible with the reference ETL
(/root/reference/transform_dataset.py:16-61, 86-201):
  * move-to:  x = round(rel_x * 1000) + 15,  y = round(rel_y * 1000)
    (the +15 offset is a reference quirk, reproduced for data parity)
  * press-keys: key = KEY_MAP[k] * 50; repeat count = (n - 2) * 200
  * scroll: direction(up) * 500
  * type:  clamp(int(value / scale * 499) + 500, 0, 999)
  * end-of-sequence sentinel: key param (index 3) == 950
"""

from __future__ import annotations

NUM_COMMANDS = 5
NUM_PARAMS = 6
NUM_BINS = 1000
ACT_DIM = 7  # cmd + 6 params
PAD_VALUE = -1
END_SENTINEL = 950  # on param index 3 (key)
SCALE_FACTOR = 1000
BIN = 50
MOVE_X_OFFSET = 15  # reference quirk: transform_dataset.py:99

# Command ids
CMD_MOVE_TO = 0
CMD_PRESS_KEYS = 1
CMD_SCROLL = 2
CMD_TYPE = 3
CMD_CLICK = 4

DEFAULT_VECTOR = [PAD_VALUE] * ACT_DIM

# Key -> code map (reference transform_dataset.py:38-59). Tuple keys are
# (modifier, key) chords.
KEY_MAP = {
    'a': 0,
    'l': 1,
    'c': 2,
    'y': 3,
    'tab': 4,
    'space': 5,
    'enter': 6,
    'up': 7,
    'down': 8,
    'left': 9,
    'right': 10,
    'esc': 11,
    ('shift', 's'): 12,
    ('shift', 'e'): 13,
    ('shift', 'y'): 14,
    ('shift', 'h'): 15,
    ('shift', 'p'): 16,
    ('shift', 0): 17,
    ('shift', 1): 18,
    ('shift', '7'): 19,
}

# Which params are valid for each command (reference
# autoregressive_transformer.py:83-89). Row = cmd, col = param index.
ACTION_PARAM_MASK = (
    (1, 1, 0, 0, 0, 0),  # move-to: x, y
    (0, 0, 1, 1, 0, 0),  # press-keys: key, times
    (0, 0, 0, 0, 1, 0),  # scroll: amount
    (0, 0, 0, 0, 0, 1),  # type: value
    (0, 0, 0, 0, 0, 0),  # click: none
)

# Param 3 ("times key pressed") is only meaningful when param 2 ("key")
# falls in [KEY3_WINDOW_LO, KEY3_WINDOW_HI) — i.e. the key code whose BIN
# range admits a repeat count (reference autoregressive_transformer.py:103-107).
KEY3_WINDOW_LO = 200
KEY3_WINDOW_HI = 250

# Human-readable parameter names, matching class_weights.json keys
# (reference trainer.py:834).
PARAM_NAMES = (
    "Label", "x", "y", "Key Pressed", "Times Key Pressed",
    "Scroll Amount", "Typed Value",
)

# Map param index -> command label whose class weight scales its loss
# (reference trainer.py:825).
PARAM_TO_LABEL = (0, 0, 1, 1, 2, 3)

# Accuracy tolerance per param and whether the tolerance window is one-sided
# ("above": pred in [t, t+tol)) or two-sided (|pred - t| < TOLERANCE)
# (reference trainer.py:20, 827-829).
TOLERANCE = 3
PARAM_TOLERANCES = (TOLERANCE - 1, TOLERANCE - 1, 50, 200, 500, TOLERANCE - 1)
PARAM_ABOVE = (False, False, True, True, True, False)
