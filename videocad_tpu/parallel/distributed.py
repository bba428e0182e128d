"""Multi-host initialization.

The reference's NCCL process-group setup (main.py:31-35) maps to
``jax.distributed.initialize`` on TPU pods: each host runs the same SPMD
program; the mesh in videocad_tpu.parallel.mesh then spans all hosts' chips
(ICI within a slice, DCN across slices). Single-host runs need none of this.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when requested; returns True if distributed.

    With no arguments, reads the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS etc.) or auto-detects the platform's cluster
    environment; silently stays single-host when nothing is configured.
    """
    configured = (coordinator_address
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("COORDINATOR_ADDRESS"))
    # A real pod launch is visible via the TPU worker list even when no
    # coordinator address is exported — jax.distributed.initialize() with
    # no args auto-detects it. Detect it here rather than skipping the
    # call: without the distributed client, Orbax's cross-process commit
    # (train/checkpoint.py) hangs on a pod.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multiworker = len([h for h in hostnames.split(",") if h.strip()]) > 1
    if not configured and num_processes is None and not multiworker:
        return jax.process_count() > 1
    already = getattr(getattr(jax.distributed, "global_state", None),
                      "client", None) is not None
    if already:   # idempotent callers: the distributed client is live
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        # Swallow ONLY double-initialization; anything else (unreachable
        # coordinator, connect timeout, bad topology) must fail loudly at
        # startup rather than resurface as an Orbax commit hang mid-run.
        if "already initialized" not in str(e).lower():
            raise
    return True
