"""TRUE multi-process global-batch assembly (ADVICE r3, high finding).

The in-process tests can only spy on put_local_shard; this one launches a
real 2-process `jax.distributed` CPU job (2 x 4 virtual devices = one
8-device data mesh spanning both processes — the rig's stand-in for a
2-host pod) and replays the trainer hot-loop batch path end to end. Each
process feeds DISTINCT rows; the workers assert the jitted global
reduction sees every host's rows and that each process's addressable
shards hold exactly its own rows at their global offsets.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_prefetch_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_batch_assembly():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", port], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out


PREEMPT_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "mp_preempt_worker.py")


def test_two_process_preemption_consensus():
    """A signal landing on ONE host stops BOTH (train/preempt.py)."""
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, PREEMPT_WORKER, str(i), "2", port], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
