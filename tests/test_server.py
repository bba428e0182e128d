"""End-to-end HTTP serving tests: protocol, batching, both engines.

Spins up the real ThreadingHTTPServer (port 0) around each engine and
drives it with the stdlib ServingClient — the full wire path (base64 .npy
bodies, status codes, lane lifecycle), not mocked handlers. Correctness
anchor: every served action must equal the dedicated
``incremental_decode_step`` trajectory for that session's inputs.
"""

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.infer.incremental import (
    incremental_decode_step,
    init_decode_carry,
)
from videocad_tpu.infer.rollout import prepare_for_decode
from videocad_tpu.infer.server import (
    ArtifactEngine,
    MuxEngine,
    ServingClient,
    SessionError,
    make_server,
)
from videocad_tpu.models import create_model, init_model

SEQ_LEN = 4
SIZE = TINY_CONFIG["image_size"]


@pytest.fixture(scope="module")
def served():
    """One MuxEngine + live HTTP server shared across this module (the
    engine's compiles dominate test time)."""
    model = create_model(dict(TINY_CONFIG))
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    engine = MuxEngine(model, params, lanes=2, seq_len=SEQ_LEN)
    server = make_server(engine)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    client = ServingClient(f"http://127.0.0.1:{server.server_address[1]}")
    yield model, params, engine, client
    server.shutdown()
    engine.stop()
    server.server_close()


def _imgs(n, seed, size=SIZE):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)


def _expected_actions(model, params, cad, frames):
    """The dedicated single-session trajectory (the engine preps its tree
    with prepare_for_decode; equality raw-vs-prepped is tested elsewhere)."""
    prepped = prepare_for_decode(params, model.config.compute_dtype)
    carry = init_decode_carry(model, prepped, jnp.asarray(cad)[None],
                              SEQ_LEN)
    actions = []
    for f in frames:
        carry, _, _ = incremental_decode_step(model, prepped,
                                              jnp.asarray(f)[None], carry)
        actions.append(np.asarray(carry["action"][0]))
    return actions


def _drive(client, cad, frames):
    sid = client.open_session(cad)
    out = [client.step(sid, f) for f in frames]
    client.close_session(sid)
    return out


def test_serve_one_session_matches_dedicated_decode(served):
    model, params, engine, client = served
    meta = client.meta()
    assert meta["engine"] == "mux" and meta["lanes"] == 2
    assert meta["seq_len"] == SEQ_LEN
    assert meta["config"]["hidden_size"] == TINY_CONFIG["hidden_size"]

    cad, frames = _imgs(1, seed=1)[0], _imgs(SEQ_LEN, seed=2)
    got = _drive(client, cad, frames)
    want = _expected_actions(model, params, cad, frames)
    for t, (g, w) in enumerate(zip(got, want)):
        assert g["step"] == t
        np.testing.assert_allclose(g["action"], w, rtol=1e-6, atol=1e-6)
        ints = np.rint(w * np.asarray([4.0] + [1000.0] * 6)).astype(int)
        assert g["cmd"] == ints[0] and g["params"] == list(ints[1:])


def test_concurrent_sessions_through_the_batcher(served):
    """Two clients stepping simultaneously (the batcher coalesces their
    requests into shared device ticks) each see their own dedicated
    trajectory — continuous batching is invisible to correctness."""
    model, params, engine, client = served
    inputs = {s: (_imgs(1, seed=10 + s)[0], _imgs(SEQ_LEN, seed=20 + s))
              for s in range(2)}
    results, errors = {}, []

    def run(s):
        try:
            results[s] = _drive(client, *inputs[s])
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=run, args=(s,)) for s in inputs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors and set(results) == set(inputs)
    for s, (cad, frames) in inputs.items():
        want = _expected_actions(model, params, cad, frames)
        for g, w in zip(results[s], want):
            np.testing.assert_allclose(g["action"], w, rtol=1e-6, atol=1e-6)


def test_protocol_errors(served):
    model, params, engine, client = served
    cad = _imgs(1, seed=3)[0]
    frame = _imgs(1, seed=4)[0]

    with pytest.raises(SessionError) as e:
        client.step("nosuchsession", frame)
    assert e.value.status == 404

    sids = [client.open_session(cad) for _ in range(2)]
    with pytest.raises(SessionError) as e:   # all lanes busy
        client.open_session(cad)
    assert e.value.status == 503

    with pytest.raises(SessionError) as e:   # wrong frame shape
        client.step(sids[0], np.zeros((8, 8, 3), np.uint8))
    assert e.value.status == 400

    for _ in range(SEQ_LEN):
        client.step(sids[0], frame)
    with pytest.raises(SessionError) as e:   # horizon exhausted
        client.step(sids[0], frame)
    assert e.value.status == 409

    for sid in sids:
        client.close_session(sid)
    with pytest.raises(SessionError) as e:   # double close
        client.close_session(sids[0])
    assert e.value.status == 404

    # lanes were released — a fresh session serves again
    sid = client.open_session(cad)
    assert client.step(sid, frame)["step"] == 0
    client.close_session(sid)


def test_stats_reports_serving_telemetry(served):
    """/v1/stats accounts every step, tracks coalescing (steps per device
    tick), and reports tick latency percentiles."""
    model, params, engine, client = served
    base = client.stats()
    cad, frames = _imgs(1, seed=60)[0], _imgs(SEQ_LEN, seed=61)
    _drive(client, cad, frames)

    s = client.stats()
    assert s["steps"] - base["steps"] == SEQ_LEN
    assert s["sessions_opened"] == base["sessions_opened"] + 1
    assert s["active_sessions"] == 0
    new_ticks = s["ticks"] - base["ticks"]
    assert 0 < new_ticks <= SEQ_LEN   # one serial client: <=1 step/tick
    assert s["coalescing_factor"] >= 1.0
    assert s["mean_tick_ms"] > 0 and s["p50_tick_ms"] <= s["p95_tick_ms"]
    assert s["uptime_s"] >= 0


def test_stale_step_cannot_touch_a_reissued_lane(served):
    """A step queued for a session that closes before its batcher tick
    must not advance the lane — otherwise a new session claiming that
    lane starts life at t=1 with a stranger's frame in its KV cache.
    Drives the batcher's validate+dispatch seam (_run_tick) directly with
    a stale (sid, lane) pair: the caller gets 410, the lane stays frozen."""
    model, params, engine, client = served
    cad, frame = _imgs(1, seed=30)[0], _imgs(1, seed=31)[0]

    old_sid, lane = engine.open_session(cad)
    engine.close_session(old_sid)
    new_sid, new_lane = engine.open_session(cad)
    assert new_lane == lane   # LIFO free list re-issues the lane

    box = {"event": threading.Event(), "result": None, "error": None}
    engine._run_tick([(old_sid, lane, frame, box)])
    assert box["event"].is_set()
    assert isinstance(box["error"], SessionError)
    assert box["error"].status == 410
    assert int(engine._carry["t"][lane]) == 0   # lane state untouched

    # the replacement session still sees its own step 0
    got = engine.step(new_sid, frame)
    want = _expected_actions(model, params, cad, [frame])
    assert got["step"] == 0
    np.testing.assert_allclose(got["action"], want[0], rtol=1e-6, atol=1e-6)
    engine.close_session(new_sid)


def test_deferred_duplicate_step_cannot_pass_the_horizon(served):
    """Two concurrent step requests can both pass step()'s enqueue-time
    horizon check at t = seq_len - 1; the batcher defers the duplicate to
    the next tick, where the authoritative re-check must 409 it instead
    of running a device step whose clamped cache write would corrupt the
    session's final KV slot."""
    model, params, engine, client = served
    cad, frame = _imgs(1, seed=70)[0], _imgs(1, seed=71)[0]
    sid, lane = engine.open_session(cad)
    for _ in range(SEQ_LEN):
        engine.step(sid, frame)

    box = {"event": threading.Event(), "result": None, "error": None}
    engine._run_tick([(sid, lane, frame, box)])   # the deferred duplicate
    assert box["event"].is_set()
    assert isinstance(box["error"], SessionError)
    assert box["error"].status == 409
    assert int(engine._carry["t"][lane]) == SEQ_LEN   # lane state frozen
    engine.close_session(sid)


def test_failed_open_does_not_leak_a_lane(served):
    """An open_session with a rejected input (wrong CAD shape / stray
    multiview payload) gets a 400 and must return the popped lane to the
    free list."""
    model, params, engine, client = served
    free_before = len(engine._free)
    with pytest.raises(SessionError) as e:
        engine.open_session(np.zeros((8, 8, 3), np.uint8))
    assert e.value.status == 400
    with pytest.raises(SessionError) as e:   # model takes no views
        engine.open_session(_imgs(1, seed=33)[0],
                            multiview_images=_imgs(2, seed=34))
    assert e.value.status == 400
    assert len(engine._free) == free_before

    sid, _ = engine.open_session(_imgs(1, seed=32)[0])   # still serves
    engine.close_session(sid)


def test_idle_sessions_are_evicted_when_lanes_are_needed(served):
    """With --session_ttl, a full engine evicts sessions idle past the
    TTL instead of 503ing new clients; fresh sessions are never evicted,
    and an evicted session id answers 404 afterwards."""
    model, params, engine, client = served
    ttl_engine = MuxEngine(model, params, lanes=2, seq_len=SEQ_LEN,
                           session_ttl_s=1.5)
    try:
        cad, frame = _imgs(1, seed=90)[0], _imgs(1, seed=91)[0]
        sid1, _ = ttl_engine.open_session(cad)
        sid2, _ = ttl_engine.open_session(cad)
        with pytest.raises(SessionError) as e:   # both sessions are fresh
            ttl_engine.open_session(cad)
        assert e.value.status == 503

        time.sleep(1.6)
        sid3, _ = ttl_engine.open_session(cad)   # evicts an idle session
        s = ttl_engine.stats()
        assert s["sessions_evicted"] >= 1
        assert s["active_sessions"] + s["sessions_evicted"] == 3
        with pytest.raises(SessionError) as e:   # evicted id is gone
            ttl_engine.step(sid1 if sid1 not in ttl_engine._smeta else sid2,
                            frame)
        assert e.value.status == 404
        assert ttl_engine.step(sid3, frame)["step"] == 0
    finally:
        ttl_engine.stop()


def test_serve_cli_builds_both_engines(tmp_path):
    """cli.serve constructs the right engine for each source flag."""
    import argparse
    import json

    from videocad_tpu.cli.serve import build_engine
    from videocad_tpu.infer.export import export_model

    cfg_path = os.path.join(str(tmp_path), "configs.json")
    with open(cfg_path, "w") as f:
        json.dump({"tiny": dict(TINY_CONFIG)}, f)
    args = argparse.Namespace(
        artifact=None, model_config=cfg_path, model_name="tiny",
        checkpoint_folder=None, checkpoint_name="best_model",
        checkpoint_dir="checkpoints", lanes=2, seq_len=SEQ_LEN,
        weight_quant="int8", session_ttl=None)
    engine = build_engine(args)
    assert isinstance(engine, MuxEngine)
    meta = engine.meta()
    assert meta["weight_quant"] == "int8" and meta["lanes"] == 2
    engine.stop()

    config = dict(TINY_CONFIG)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny.vcdx")
    export_model(config, params, 1, SEQ_LEN, out)
    args.artifact = out
    assert isinstance(build_engine(args), ArtifactEngine)


def test_artifact_mux_engine_serves_concurrent_sessions(tmp_path):
    """A lanes=N export serves N concurrent sessions from the artifact
    alone (ArtifactMuxEngine, no model code): staggered open/step/close
    trajectories each equal the dedicated incremental run, lanes recycle,
    and cli.serve routes the artifact to the mux engine."""
    import argparse

    from videocad_tpu.cli.serve import build_engine
    from videocad_tpu.infer.export import export_model
    from videocad_tpu.infer.server import ArtifactMuxEngine

    config = dict(TINY_CONFIG)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny_mux.vcdx")
    meta = export_model(config, params, 1, SEQ_LEN, out, lanes=2)
    assert meta["mux_lanes"] == 2 and not meta["mux_multiview"]

    engine = build_engine(argparse.Namespace(artifact=out,
                                             session_ttl=None))
    assert isinstance(engine, ArtifactMuxEngine)
    server = make_server(engine)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    client = ServingClient(f"http://127.0.0.1:{server.server_address[1]}")
    try:
        m = client.meta()
        assert m["engine"] == "artifact-mux" and m["lanes"] == 2

        cads = {s: _imgs(1, seed=40 + s)[0] for s in range(3)}
        frames = {s: _imgs(SEQ_LEN, seed=50 + s) for s in range(3)}

        # staggered: A steps alone, then A+B interleave, A closes, C reuses
        sid_a = client.open_session(cads[0])
        got_a = [client.step(sid_a, frames[0][0])]
        sid_b = client.open_session(cads[1])
        got_b = []
        for t in range(1, SEQ_LEN):
            got_a.append(client.step(sid_a, frames[0][t]))
            got_b.append(client.step(sid_b, frames[1][t - 1]))
        client.close_session(sid_a)
        sid_c = client.open_session(cads[2])   # freed lane recycles
        got_c = [client.step(sid_c, frames[2][0])]
        got_b.append(client.step(sid_b, frames[1][SEQ_LEN - 1]))
        client.close_session(sid_b)
        client.close_session(sid_c)

        for s, got in ((0, got_a), (1, got_b), (2, got_c)):
            want = _expected_actions(model, params, cads[s],
                                     frames[s][:len(got)])
            for t, (g, w) in enumerate(zip(got, want)):
                assert g["step"] == t
                np.testing.assert_allclose(g["action"], w,
                                           rtol=1e-6, atol=1e-6)
    finally:
        server.shutdown()
        engine.stop()
        server.server_close()


def test_gencad_artifact_serves_256_cad_images(tmp_path):
    """Artifacts exported from use_pretrained_cad_model configs take
    256x256x3 Canny-edge CAD images regardless of the frame image_size —
    both artifact engines must validate against the exported CAD shape,
    not the frame shape (a frame-shaped cad must 400, the 256 edge image
    must serve)."""
    from videocad_tpu.infer.export import export_model
    from videocad_tpu.infer.server import ArtifactMuxEngine

    config = dict(TINY_CONFIG, use_pretrained_cad_model=True)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny_gencad.vcdx")
    export_model(config, params, 1, SEQ_LEN, out, lanes=2)

    cad256 = _imgs(1, seed=80, size=256)[0]
    frame = _imgs(1, seed=81)[0]

    for engine in (ArtifactMuxEngine(out), ArtifactEngine(out)):
        try:
            with pytest.raises(SessionError) as e:   # frame-shaped cad
                engine.open_session(_imgs(1, seed=82)[0])
            assert e.value.status == 400 and "256" in str(e.value)
            sid, _ = engine.open_session(cad256)
            got = engine.step(sid, frame)
            assert got["step"] == 0
            engine.close_session(sid)
        finally:
            engine.stop()


def test_artifact_engine_serves_vcdx(tmp_path):
    """The artifact engine serves a .vcdx with no model code: its steps
    equal the exported decode pair driven directly (which test_export.py
    pins to the batch rollout)."""
    from videocad_tpu.infer.export import export_model, load_exported

    config = dict(TINY_CONFIG)
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    out = os.path.join(str(tmp_path), "tiny.vcdx")
    export_model(config, params, 1, SEQ_LEN, out)

    engine = ArtifactEngine(out)
    server = make_server(engine)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    client = ServingClient(f"http://127.0.0.1:{server.server_address[1]}")
    try:
        assert client.meta()["engine"] == "artifact"
        cad, frames = _imgs(1, seed=5)[0], _imgs(SEQ_LEN, seed=6)
        got = _drive(client, cad, frames)
        s = client.stats()
        assert s["steps"] == SEQ_LEN and s["sessions_opened"] == 1
        assert s["mean_step_ms"] > 0

        loaded = load_exported(out)
        carry = loaded.decode_init(cad[None])
        for t, f in enumerate(frames):
            carry, _, _ = loaded.decode_step(f[None], carry)
            np.testing.assert_allclose(
                got[t]["action"], np.asarray(carry["action"][0]),
                rtol=1e-6, atol=1e-6)

        # one session at a time (shared step counter)
        sid = client.open_session(cad)
        with pytest.raises(SessionError) as e:
            client.open_session(cad)
        assert e.value.status == 503
        client.close_session(sid)
    finally:
        server.shutdown()
        server.server_close()
