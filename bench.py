"""Benchmark: flagship-model training throughput (frames/sec/chip).

Runs on whatever backend the environment pins (the driver runs it on one
real TPU chip). Synthetic uint8 batches shaped like the real pipeline's
output feed a bf16 teacher-forced train step on the flagship config
(cad_past_10_actions_and_states_timestep_embedding — hidden 1024, 8 decoder
layers, ViT-512/6 per-frame encoder, window 10, 186-step horizon bucket).

Prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s/chip", "vs_baseline": N / BASELINE_A100_FPS}

``vs_baseline`` compares against an ESTIMATED reference A100 throughput
(the reference publishes none — BASELINE.md): torch-eager per-frame ViT-512
with a 2-worker PIL/pickle host pipeline (main.py defaults) is host-bound;
we credit it 1000 frames/s/chip, which is generous for that stack.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from videocad_tpu.data.synthetic import synthetic_batch_feed
from videocad_tpu.models import create_model, init_model
from videocad_tpu.models.factory import flagship_config
from videocad_tpu.train import (
    REFERENCE_CMD_WEIGHTS,
    LossConfig,
    make_train_step,
)
from videocad_tpu.train.state import create_train_state

BASELINE_A100_FPS = 1000.0  # estimated reference throughput (see docstring)

# The flagship NAMED config, loaded from model_configs/
# transformer_experiments.json — the bench measures the same definition
# the experiment runner trains (perf fields dtype/remat_encoder/
# vit_attention_impl are part of the named config itself).
FLAGSHIP = flagship_config()

LOSS_CONFIG = LossConfig(cmd_weights=REFERENCE_CMD_WEIGHTS, use_mse=True)


def bench_rollout(batch_size: int = 8, seq_len: int = 187, warmup: int = 1,
                  iters: int = 3, weight_quant: str = "none"):
    """186-step autoregressive rollout throughput (actions/sec).

    The reference rollout re-runs a full forward per step (O(T^2) with O(T)
    frame re-encodes each — autoregressive_transformer.py:222-274); ours is
    the KV-cached lax.scan engine. Run via `python bench.py rollout
    [batch_size]` (batch 8 is the headline; larger batches amortize the
    per-step decoder weight stream — serving mode).
    """
    actions_per_sec = _measure_rollout(batch_size, seq_len, warmup, iters,
                                       weight_quant)
    suffix = {"none": "", "int8": "_w8", "int4": "_w4"}[weight_quant]
    print(json.dumps({
        "metric": f"rollout_actions_per_sec{suffix}",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": None,
    }))


def _measure_serve(lanes: int, seq_len: int = 187,
                   weight_quant: str = "none") -> dict:
    """Serving-engine steady state: all lanes active, one multiplexed
    decode step per tick (infer/multiplex.py — the device program behind
    cli/serve's continuous batcher).

    Returns pipelined throughput (async dispatch, one sync at the end —
    what a saturated server achieves) and synchronous per-step latency
    (fetch the action every step — what one client observes when the
    batcher fetches results per tick).
    """
    from videocad_tpu.infer.multiplex import (init_mux_carry, mux_decode_step,
                                              open_lane)
    from videocad_tpu.infer.rollout import (prepare_for_decode,
                                            quantize_for_decode)

    model = create_model(FLAGSHIP)
    raw = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    if weight_quant in ("int8", "int4"):
        params = quantize_for_decode(raw, model.config.compute_dtype,
                                     bits=8 if weight_quant == "int8" else 4)
    else:
        params = prepare_for_decode(raw, model.config.compute_dtype)

    rng = np.random.default_rng(0)
    img = (model.config.image_size,) * 2 + (3,)
    carry = init_mux_carry(model, raw, lanes, seq_len)
    for lane in range(lanes):
        cad = jnp.asarray(rng.integers(0, 256, (1,) + img, dtype=np.uint8))
        carry = open_lane(model, params, carry, jnp.asarray(lane), cad)
    frames = jnp.asarray(rng.integers(0, 256, (lanes,) + img,
                                      dtype=np.uint8))
    active = jnp.ones((lanes,), bool)

    carry, c, _ = mux_decode_step(model, params, frames, active, carry)
    float(c[0, 0])  # compile + sync

    n_sync = 16
    t0 = time.perf_counter()
    for _ in range(n_sync):
        carry, c, _ = mux_decode_step(model, params, frames, active, carry)
        float(c[0, 0])
    sync_ms = (time.perf_counter() - t0) * 1000 / n_sync

    n = seq_len - 1 - n_sync
    t0 = time.perf_counter()
    for _ in range(n):
        carry, c, _ = mux_decode_step(model, params, frames, active, carry)
    float(c[0, 0])
    elapsed = time.perf_counter() - t0
    return {
        "actions_per_sec": round(lanes * n / elapsed, 2),
        "pipelined_step_ms": round(elapsed * 1000 / n, 2),
        "sync_step_ms": round(sync_ms, 2),
    }


def bench_serve(lanes: int = 8, seq_len: int = 187,
                weight_quant: str = "none"):
    """One-line serving steady-state report (`python bench.py serve
    [lanes] [int8|int4]`); see _measure_serve for the methodology."""
    m = _measure_serve(lanes, seq_len, weight_quant)
    suffix = {"none": "", "int8": "_w8", "int4": "_w4"}[weight_quant]
    print(json.dumps({
        "metric": f"serve_actions_per_sec{suffix}",
        "value": m["actions_per_sec"],
        "unit": "actions/s",
        "vs_baseline": None,
        "lanes": lanes,
        "pipelined_step_ms": m["pipelined_step_ms"],
        "sync_step_ms": m["sync_step_ms"],
    }))


def bench_e2e(batch_size: int = 8, bucket: int = 192, steps: int = 4,
              epochs: int = 2):
    """End-to-end training throughput: real Trainer + native .vcb loader.

    Generates a synthetic flagship-shaped .vcb store (224x224x3 uint8,
    ragged lengths padded to the 192 bucket), then runs the actual
    ``Trainer._train_epoch`` loop — C++ loader -> device_prefetch ->
    jitted train step — and times the second epoch (first pays compile).
    Also reports the host loader's standalone assembly rate, and the
    resident-batch device step rate, so the binding constraint is visible:
    on a production TPU host, e2e ~= min(loader, step); on this
    environment the TPU is behind a network tunnel whose ~0.03 GB/s H2D
    bandwidth dominates (a 231 MB uint8 batch takes ~8 s to ship vs a
    0.22 s step), which is an environment property, not a pipeline one.

    Run via `python bench.py e2e`.
    """
    import os
    import shutil
    import tempfile

    from videocad_tpu.data.native import NativePipeline, scan_vcb, write_vcb
    from videocad_tpu.data.synthetic import random_action_sequence
    from videocad_tpu.train.trainer import Trainer

    root = tempfile.mkdtemp(prefix="vcb_bench_")
    try:
        rng = np.random.default_rng(0)
        num_seqs = batch_size * steps
        for i in range(num_seqs):
            length = int(rng.integers(bucket - 40, bucket))
            frames = rng.integers(0, 256, size=(length, 224, 224, 3),
                                  dtype=np.uint8)
            cad = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
            actions = random_action_sequence(rng, length).astype(np.int32)
            write_vcb(os.path.join(root, f"{i:08d}_data.vcb"), cad, frames,
                      actions)
        paths = scan_vcb(root)

        pipe = NativePipeline(paths, batch_size=batch_size, bucket_len=bucket,
                              image_shape=(224, 224, 3), shuffle=True)

        # Host loader standalone: how fast can the C++ pipeline assemble
        # padded batches (the "can it feed the chip" number)?
        t0 = time.perf_counter()
        n_loader = sum(1 for _ in pipe.epoch(0))
        loader_elapsed = time.perf_counter() - t0
        loader_fps = n_loader * batch_size * (bucket - 1) / loader_elapsed

        model = create_model(FLAGSHIP)
        params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
        training_config = {
            "lr": 1e-5, "noise": True, "early_stopping_enabled": False,
            "experiment_name": "bench_e2e",
            "checkpoint_dir": os.path.join(root, "ckpt"),
        }
        trainer = Trainer(model, pipe, pipe, pipe, training_config,
                          LOSS_CONFIG, params=params,
                          log_dir=os.path.join(root, "logs"))
        trainer._train_epoch(0)  # compile + warm
        t0 = time.perf_counter()
        avg_loss, _ = trainer._train_epoch(1)  # _snapshot syncs at the end
        elapsed = time.perf_counter() - t0
        e2e_fps = steps * batch_size * (bucket - 1) / elapsed

        print(json.dumps({
            "metric": "e2e_train_frames_per_sec_per_chip",
            "value": round(e2e_fps, 2),
            "unit": "frames/s/chip",
            "vs_baseline": round(e2e_fps / BASELINE_A100_FPS, 3),
            "host_loader_frames_per_sec": round(loader_fps, 2),
            "avg_loss": round(float(avg_loss), 4),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _measure_train(batch_size: int, seq_len: int, config: dict,
                   warmup: int = 3, iters: int = 10) -> float:
    """frames/s/chip for one (batch, bucket, model-config) operating point."""
    model = create_model(config)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    state, tx = create_train_state(params, {"lr": 1e-5})

    batch_np = synthetic_batch_feed(batch_size, seq_len, image_size=224,
                                    channels=3, seed=0)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in batch_np.items()}

    step = jax.jit(make_train_step(model, tx, LOSS_CONFIG), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    for _ in range(warmup):
        state, loss, _ = step(state, batch, rng)
    float(loss)  # full sync: on the tunneled TPU backend,
    # block_until_ready can return before execution finishes; fetching the
    # value is the reliable barrier.

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, batch, rng)
    float(loss)
    elapsed = time.perf_counter() - t0

    # frames actually encoded per step: B * (T-1) after the teacher shift
    frames_per_step = batch_size * (seq_len - 1)
    return frames_per_step * iters / elapsed


def main(batch_size: int = 8, seq_len: int = 192, warmup: int = 3,
         iters: int = 20):
    # 20 timed iterations: at ~143 ms/step the 10-iter window was within
    # run-to-run tunnel jitter (~1%); 20 halves the variance of the
    # driver-recorded headline.
    fps = _measure_train(batch_size, seq_len, FLAGSHIP, warmup, iters)
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_A100_FPS, 3),
    }))


def bench_sweep(out_path: str = "docs/perf_sweep.json",
                only: str = "all"):
    """Map the operating envelope (VERDICT r2 next-round #5).

    frames/s/chip x {bucket 48/96/144/192} x {batch 8/16} x {default
    fused-MHSA, block-kernel memory mode}, plus rollout actions/s x
    {batch 8/64} x {bf16, w8 int8-weight} decode. Each point is appended
    to ``out_path`` as it lands (the sweep is long; partial results must
    survive an interrupt), and ``tools/gen_perf_table.py`` renders
    docs/PERF.md's envelope table from the JSON — generated, not
    hand-collected. A point that OOMs is recorded as such.

    ``only='rollout'`` / ``only='serve'`` keep the other kinds' existing
    points in ``out_path`` and re-measure just that section
    (`python bench.py sweep docs/perf_sweep.json rollout`). The serve
    section measures the lane-multiplexed serving engine's steady state
    (8 lanes, bf16 vs w8).
    """
    import os

    points = []
    if only != "all" and os.path.exists(out_path):
        with open(out_path) as f:   # keep the other kinds' prior points
            points = [p for p in json.load(f) if p.get("kind") != only]

    def record(point):
        points.append(point)
        print(json.dumps(point), flush=True)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(points, f, indent=1)

    modes = {
        "fused": FLAGSHIP,
        "block": dict(FLAGSHIP, vit_attention_impl="block",
                      vit_mlp_impl="block"),
    }
    if only == "all":
        for bucket in (48, 96, 144, 192):
            for batch in (8, 16):
                for mode_name, cfg in modes.items():
                    point = {"kind": "train", "bucket": bucket,
                             "batch": batch, "mode": mode_name}
                    try:
                        fps = _measure_train(batch, bucket, cfg)
                        point["frames_per_sec"] = round(fps, 1)
                    except Exception as e:  # OOM / compile failure: record
                        msg = str(e)
                        point["error"] = ("OOM" if "RESOURCE_EXHAUSTED" in msg
                                          or "memory" in msg.lower()
                                          else msg[:200])
                    record(point)
    if only in ("all", "rollout"):
        for batch in (8, 64):
            for wq in ("none", "int8"):
                point = {"kind": "rollout", "batch": batch, "bucket": 187,
                         "weights": "bf16" if wq == "none" else "w8"}
                try:
                    t0 = time.perf_counter()
                    aps = _measure_rollout(batch, weight_quant=wq)
                    point["actions_per_sec"] = round(aps, 1)
                    point["wall_s"] = round(time.perf_counter() - t0, 1)
                except Exception as e:
                    point["error"] = str(e)[:200]
                record(point)
    if only in ("all", "serve"):
        for lanes in (8,):
            for wq in ("none", "int8"):
                point = {"kind": "serve", "lanes": lanes,
                         "weights": "bf16" if wq == "none" else "w8"}
                try:
                    point.update(_measure_serve(lanes, weight_quant=wq))
                except Exception as e:
                    point["error"] = str(e)[:200]
                record(point)
    print(json.dumps({"metric": "sweep_points", "value": len(points),
                      "unit": "points", "vs_baseline": None}))


def bench_smoke():
    """Pre-snapshot TPU compile gate (`python bench.py smoke`).

    Compiles AND runs one iteration of every hardware-lowered program on
    the REAL backend at small shapes: the flagship train step (fwd+bwd)
    in both ``vit_attention_impl`` modes (dropout on — the hardware-PRNG
    path inside the fused kernels is exactly where the r4 Mosaic break
    hid), the KV-cached rollout, the lane-multiplexed serving step, and
    the Pallas preprocess kernels. The CPU test suite runs all Pallas
    kernels with ``interpret=True`` and structurally cannot catch
    Mosaic-lowering regressions (three reached HEAD in rounds 3-4); this
    gate exists so no round ends without a real-backend compile of each.

    Exits non-zero on any compile/run failure. Small shapes keep the wall
    time to a few minutes on the tunneled chip; Mosaic lowering does not
    depend on the block counts these shapes shrink.
    """
    import sys

    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({"metric": "smoke", "value": 0, "unit": "checks",
                          "vs_baseline": None,
                          "error": f"needs the TPU backend, got {backend}"}))
        sys.exit(1)

    checks = []

    def run(name, fn):
        t0 = time.perf_counter()
        fn()
        wall = round(time.perf_counter() - t0, 1)
        checks.append(name)
        print(json.dumps({"smoke_check": name, "wall_s": wall}), flush=True)

    # 1-2. Flagship train step, both ViT attention modes, dropout active.
    run("train_fused", lambda: _measure_train(8, 48, FLAGSHIP,
                                              warmup=1, iters=1))
    run("train_block", lambda: _measure_train(
        8, 48, dict(FLAGSHIP, vit_attention_impl="block",
                    vit_mlp_impl="block"), warmup=1, iters=1))
    # 3. KV-cached rollout scan (the sequential_evaluate engine).
    run("rollout", lambda: _measure_rollout(2, seq_len=32, warmup=1,
                                            iters=1))
    # 4. Lane-multiplexed serving step (cli/serve's device program).
    run("mux_serve", lambda: _measure_serve(2, seq_len=24))
    # 5. Pallas preprocess kernels (grayscale+normalize, and with resize).
    from videocad_tpu.ops.preprocess import grayscale_normalize_pallas

    def preprocess():
        img = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (4, 224, 224, 3), np.uint8))
        float(grayscale_normalize_pallas(img)[0, 0, 0, 0])
        float(grayscale_normalize_pallas(img, target_size=(112, 112)
                                         )[0, 0, 0, 0])
    run("preprocess_pallas", preprocess)

    print(json.dumps({"metric": "smoke", "value": len(checks),
                      "unit": "checks", "vs_baseline": None,
                      "passed": checks}))


def _measure_rollout(batch_size: int, seq_len: int = 187, warmup: int = 1,
                     iters: int = 3, weight_quant: str = "none") -> float:
    from videocad_tpu.infer.rollout import sequential_inference

    model = create_model(FLAGSHIP)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    feed = synthetic_batch_feed(batch_size, seq_len, image_size=224,
                                channels=3, seed=0)
    frames = jax.device_put(jnp.asarray(feed["frames"]))
    cad = jax.device_put(jnp.asarray(feed["cad_image"]))
    for _ in range(warmup):
        cmds, _ = sequential_inference(model, params, frames, cad,
                                       weight_quant=weight_quant)
    float(cmds[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        cmds, _ = sequential_inference(model, params, frames, cad,
                                       weight_quant=weight_quant)
    float(cmds[0, 0, 0])
    return batch_size * seq_len * iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "rollout":
        bench_rollout(batch_size=int(sys.argv[2]) if len(sys.argv) > 2
                      else 8,
                      weight_quant=sys.argv[3] if len(sys.argv) > 3
                      else "none")
    elif len(sys.argv) > 1 and sys.argv[1] == "serve":
        bench_serve(lanes=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                    weight_quant=sys.argv[3] if len(sys.argv) > 3
                    else "none")
    elif len(sys.argv) > 1 and sys.argv[1] == "e2e":
        bench_e2e()
    elif len(sys.argv) > 1 and sys.argv[1] == "smoke":
        bench_smoke()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep":
        bench_sweep(*sys.argv[2:4])
    elif len(sys.argv) > 1 and sys.argv[1] == "quant":
        # int8 MXU dense layers (ops/quant.py): v5e runs int8 matmuls at
        # 2x the bf16 rate. 'int8' = forward only; 'int8_bwd' = all three
        # matmuls per dense layer.
        mode = sys.argv[2] if len(sys.argv) > 2 else "int8"
        fps = _measure_train(8, 192, dict(FLAGSHIP, quant=mode), iters=20)
        print(json.dumps({
            "metric": f"train_frames_per_sec_per_chip_quant_{mode}",
            "value": round(fps, 2),
            "unit": "frames/s/chip",
            "vs_baseline": round(fps / BASELINE_A100_FPS, 3),
        }))
    else:
        main()
