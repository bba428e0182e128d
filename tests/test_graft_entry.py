"""The driver's multi-chip gate: dryrun_multichip must self-bootstrap.

Round 1 failed exactly here (MULTICHIP_r01.json ok:false): the dryrun ran
in a process whose JAX backend was already pinned to the single TPU chip
and could not create the 8-device CPU mesh. The fix re-execs the dryrun
body in a subprocess with the CPU platform + host device count forced
before backend init; this test runs that exact path.
"""

import pytest

import __graft_entry__


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    # Raises on any failure (non-zero subprocess rc).
    __graft_entry__.dryrun_multichip(8)
