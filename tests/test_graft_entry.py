"""Driver-contract test: dryrun_multichip must pass when invoked exactly as
the driver does — a fresh process whose env pins the axon/TPU platform
(JAX_PLATFORMS=axon), with no conftest-style CPU override in scope.

Round-1 regression: MULTICHIP_r01.json recorded rc=1 because the dryrun
inherited the session's single-device axon backend instead of forcing the
n-device virtual CPU mesh.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    env = dict(os.environ)
    # Mimic the driver session: the env pins the axon platform.  The parent
    # process never initializes a backend (dryrun re-execs into a clean CPU
    # child), so this does not require a reachable TPU.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_ECHO_DRYRUN_CHILD", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=570)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN OK" in proc.stdout
