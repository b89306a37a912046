"""In-suite guard for the 2-process multi-host dryrun.

The driver's MULTICHIP check ends with ``_dryrun_multihost()`` — a 2-process
``jax.distributed.initialize`` over loopback with a psum across processes
(the reference's multi-machine DDP analog, reference scripts/train.py:139-152).
Round 3 shipped with that check red because the subprocesses inherited the
parent's ``--xla_force_host_platform_device_count=8`` and built a 16-device
mesh over a (2,)-shaped array. This test runs the exact same code path inside
the suite so the driver check can't silently rot again.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent))


@pytest.mark.slow
def test_two_process_distributed_psum():
    import __graft_entry__ as g

    # Raises AssertionError on any subprocess failure or timeout.
    g._dryrun_multihost(num_processes=2)
