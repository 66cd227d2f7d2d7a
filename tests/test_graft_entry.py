"""Driver-contract tests for __graft_entry__.py.

The driver validates multi-chip sharding by calling
``dryrun_multichip(n)`` in a fresh process with NO environment
preparation (round-1 failure mode: the hook asserted on device count
instead of provisioning the virtual CPU platform itself).  Reproduce
that exact calling convention here: a clean subprocess, default env.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_devices():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(4)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "step ok" in proc.stdout
