"""Multi-host (DCN) mesh execution (SURVEY.md §5 distributed backend;
2-process analog of the reference's process fan-out, factor.py:929-1000)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multihost_two_processes():
    """Two jax.distributed controllers, one global (dp=2, mp=4) mesh whose
    dp axis crosses the process boundary, several jitted sweeps of the
    flagship constrained model with globally sharded state."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in os.environ.items()
             if "XLA_FLAGS" not in k and "JAX_PLATFORMS" not in k})
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "dryrun_multihost: OK" in proc.stdout
