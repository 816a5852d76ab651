"""Simulated multi-host execution: 2 jax.distributed CPU processes with
Gloo collectives (the DCN stand-in) running the sharded mapping step.
The heavy lifting lives in scripts/dryrun_twohost.py; this test asserts
the cross-process merge is equivalent to the single-device step."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_twohost_dryrun():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "dryrun_twohost.py")],
        capture_output=True, text=True, timeout=900, cwd=ROOT, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "twohost-equivalence=ok" in r.stdout
