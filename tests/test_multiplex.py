"""Lane-multiplexed serving decode equals dedicated single-session runs.

The serving engine (infer/server.py) coalesces concurrent sessions into one
``mux_decode_step`` per tick. The contract under test: any interleaving of
``open_lane`` / ``mux_decode_step`` / ``close_lane`` calls produces, lane
for lane, exactly the logits of each session's own dedicated
``incremental_decode_step`` run — sessions cannot observe each other, idle
lanes are bit-frozen, and lanes are reusable after close.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.infer.incremental import (
    incremental_decode_step,
    init_decode_carry,
)
from videocad_tpu.infer.multiplex import (
    close_lane,
    init_mux_carry,
    mux_decode_step,
    open_lane,
)
from videocad_tpu.infer.rollout import prepare_for_decode, quantize_for_decode
from videocad_tpu.models import create_model, init_model

SEQ_LEN = 6
LANES = 3


def _build(overrides=None):
    cfg = dict(TINY_CONFIG, **(overrides or {}))
    model = create_model(cfg)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    return model, params


def _imgs(n, size, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)


def _dedicated_run(model, params, cad, frames, multiview=None):
    """The single-session serving loop this session would see alone."""
    mv = jnp.asarray(multiview)[None] if multiview is not None else None
    carry = init_decode_carry(model, params, jnp.asarray(cad)[None],
                              SEQ_LEN, multiview_images=mv)
    outs = []
    for f in frames:
        carry, c, p = incremental_decode_step(model, params,
                                              jnp.asarray(f)[None], carry)
        outs.append((np.asarray(c[0]), np.asarray(p[0]),
                     np.asarray(carry["action"][0])))
    return outs


class _MuxDriver:
    """Host-side driver mirroring server.MuxEngine's device calls."""

    def __init__(self, model, params, multiview=False):
        self.model, self.params = model, params
        size = model.config.image_size
        self.img = (size, size, 3)
        self.carry = init_mux_carry(model, params, LANES, SEQ_LEN,
                                    multiview=multiview)

    def open(self, lane, cad, multiview=None):
        mv = jnp.asarray(multiview)[None] if multiview is not None else None
        self.carry = open_lane(self.model, self.params, self.carry,
                               jnp.asarray(lane), jnp.asarray(cad)[None], mv)

    def close(self, lane):
        self.carry = close_lane(self.carry, lane)

    def tick(self, steps):
        """steps: {lane: frame}; one coalesced device call."""
        frames = np.zeros((LANES,) + self.img, np.uint8)
        active = np.zeros((LANES,), bool)
        for lane, f in steps.items():
            frames[lane] = f
            active[lane] = True
        self.carry, cmd, par = mux_decode_step(
            self.model, self.params, jnp.asarray(frames),
            jnp.asarray(active), self.carry)
        return {lane: (np.asarray(cmd[lane]), np.asarray(par[lane]),
                       np.asarray(self.carry["action"][lane]))
                for lane in steps}


def _lane_slice(carry, lane):
    return [np.asarray(leaf[lane])
            for leaf in jax.tree_util.tree_leaves(carry)]


PREPS = {
    "raw": lambda params, dtype: params,
    "prepared": prepare_for_decode,
    "int8": quantize_for_decode,
}


@pytest.mark.parametrize("prep", list(PREPS), ids=list(PREPS))
def test_interleaved_sessions_equal_dedicated_runs(prep):
    """Three sessions opening/stepping/closing at staggered ticks each see
    exactly their dedicated single-session trajectory — for raw params and
    for both session-prepped trees the engine actually serves (fused-qkv
    compute-dtype, w8a16 int8)."""
    model, params = _build()
    params = PREPS[prep](params, model.config.compute_dtype)
    size = model.config.image_size

    cad_a, cad_b, cad_c = _imgs(3, size, seed=1)
    frames_a = _imgs(4, size, seed=2)
    frames_b = _imgs(4, size, seed=3)
    frames_c = _imgs(2, size, seed=4)

    mux = _MuxDriver(model, params)
    got = {"a": [], "b": [], "c": []}

    mux.open(1, cad_a)                                  # tick 0
    got["a"].append(mux.tick({1: frames_a[0]})[1])
    got["a"].append(mux.tick({1: frames_a[1]})[1])      # tick 1
    mux.open(0, cad_b)                                  # tick 2: B joins
    out = mux.tick({1: frames_a[2], 0: frames_b[0]})
    got["a"].append(out[1])
    got["b"].append(out[0])
    got["b"].append(mux.tick({0: frames_b[1]})[0])      # tick 3: A idles
    out = mux.tick({1: frames_a[3], 0: frames_b[2]})    # tick 4
    got["a"].append(out[1])
    got["b"].append(out[0])
    mux.close(1)                                        # A done
    mux.open(1, cad_c)                                  # C reuses lane 1
    out = mux.tick({1: frames_c[0], 0: frames_b[3]})    # tick 5
    got["c"].append(out[1])
    got["b"].append(out[0])
    got["c"].append(mux.tick({1: frames_c[1]})[1])      # tick 6

    want = {"a": _dedicated_run(model, params, cad_a, frames_a),
            "b": _dedicated_run(model, params, cad_b, frames_b),
            "c": _dedicated_run(model, params, cad_c, frames_c)}
    for sid in ("a", "b", "c"):
        assert len(got[sid]) == len(want[sid])
        for step, (g, w) in enumerate(zip(got[sid], want[sid])):
            for gi, wi in zip(g, w):
                np.testing.assert_allclose(gi, wi, rtol=1e-5, atol=1e-5,
                                           err_msg=f"session {sid} step "
                                                   f"{step} ({prep})")
        # identical decoded actions (the serving output)
        np.testing.assert_array_equal(
            np.stack([g[2] for g in got[sid]]),
            np.stack([w[2] for w in want[sid]]))


def test_idle_lane_is_bit_frozen():
    """A tick that steps only lane 0 leaves every bit of lane 1's state —
    counters, pending action, CAD stream, all KV caches — unchanged."""
    model, params = _build()
    size = model.config.image_size
    mux = _MuxDriver(model, params)
    mux.open(1, _imgs(1, size, seed=1)[0])
    mux.open(0, _imgs(1, size, seed=2)[0])
    mux.tick({1: _imgs(1, size, seed=3)[0]})

    before = _lane_slice(mux.carry, 1)
    mux.tick({0: _imgs(1, size, seed=4)[0]})
    after = _lane_slice(mux.carry, 1)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)


def test_mux_multiview_sessions():
    """Multiview configs serve through the mux: per-lane CAD+view context
    equals the dedicated multiview incremental run."""
    model, params = _build(dict(num_views=2))
    size = model.config.image_size
    cad = _imgs(1, size, seed=1)[0]
    views = _imgs(2, size, seed=5)
    frames = _imgs(3, size, seed=2)

    mux = _MuxDriver(model, params, multiview=True)
    mux.open(2, cad, multiview=views)
    got = [mux.tick({2: f})[2] for f in frames]
    want = _dedicated_run(model, params, cad, frames, multiview=views)
    for g, w in zip(got, want):
        for gi, wi in zip(g, w):
            np.testing.assert_allclose(gi, wi, rtol=1e-5, atol=1e-5)


def test_mux_requires_action_feedback():
    model, params = _build(dict(enable_past_actions=False))
    with pytest.raises(ValueError, match="enable_past_actions"):
        init_mux_carry(model, params, LANES, SEQ_LEN)


def test_mux_lane_past_horizon_is_bit_frozen():
    """A tick for a lane whose t has reached seq_len must leave the lane
    bit-frozen (the clamped cache write would otherwise corrupt the final
    slot), while other lanes keep stepping normally."""
    model, params = _build()
    size = model.config.image_size
    mux = _MuxDriver(model, params)
    mux.open(0, _imgs(1, size, seed=1)[0])
    mux.open(1, _imgs(1, size, seed=2)[0])
    for i in range(SEQ_LEN):                     # lane 0 to the horizon
        mux.tick({0: _imgs(1, size, seed=10 + i)[0]})

    before = _lane_slice(mux.carry, 0)
    mux.tick({0: _imgs(1, size, seed=30)[0],     # overrun attempt
              1: _imgs(1, size, seed=31)[0]})    # legitimate step
    after = _lane_slice(mux.carry, 0)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)
    assert int(mux.carry["t"][0]) == SEQ_LEN
    assert int(mux.carry["t"][1]) == 1           # lane 1 stepped


def test_mux_under_mesh_equals_unsharded():
    """The serving tick runs with the lane axis sharded over the data axis
    of a (data=4, model=2) mesh — per-lane actions match the unsharded mux
    bit-for-byte, so a serving host scales lanes across chips the same way
    training shards its batch."""
    from videocad_tpu.parallel.mesh import batch_sharding, create_mesh

    model, params = _build()
    size = model.config.image_size
    lanes = 8
    cads = [_imgs(1, size, seed=60 + i)[0] for i in range(lanes)]
    ticks = [_imgs(lanes, size, seed=70 + t) for t in range(3)]

    def run(shard):
        mesh = create_mesh(4, 2) if shard else None
        put = ((lambda a: jax.device_put(a, batch_sharding(mesh)))
               if shard else (lambda a: a))
        carry = init_mux_carry(model, params, lanes, SEQ_LEN)
        carry = jax.tree_util.tree_map(put, carry)
        for i, cad in enumerate(cads):
            carry = open_lane(model, params, carry, jnp.asarray(i),
                              jnp.asarray(cad)[None])
        active = put(jnp.ones((lanes,), bool))
        outs = []
        for frames in ticks:
            carry, cmd, _ = mux_decode_step(model, params,
                                            put(jnp.asarray(frames)),
                                            active, carry)
            outs.append((np.asarray(cmd),
                         np.asarray(carry["action"])))
        return outs

    for (cmd_s, act_s), (cmd_u, act_u) in zip(run(True), run(False)):
        np.testing.assert_allclose(cmd_s, cmd_u, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(act_s, act_u)
