"""Worker for the 2-process preemption-consensus test — NOT a pytest module.

Only process 0 receives the (self-delivered) SIGTERM; both processes must
agree to stop via PreemptionGuard.consensus(), mirroring a pod where the
maintenance notice lands on one host first.
"""

import os
import signal
import sys


def main():
    idx, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                               process_id=idx)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from videocad_tpu.train.preempt import PreemptionGuard

    guard = PreemptionGuard().install()
    try:
        # Poll 1: nobody signaled — every process must agree "keep going".
        assert guard.consensus() is False, idx
        if idx == 0:
            os.kill(os.getpid(), signal.SIGTERM)
        assert guard.signaled is (idx == 0)
        # Poll 2: process 0 was signaled — EVERY process must now agree.
        assert guard.consensus() is True, idx
    finally:
        guard.uninstall()
    print(f"WORKER_OK {idx}", flush=True)


if __name__ == "__main__":
    main()
