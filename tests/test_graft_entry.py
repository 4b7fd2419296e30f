"""Regression tests for the driver entry points (__graft_entry__).

Round-1 failure mode: the driver imports jax (binding one real device), then calls
dryrun_multichip(8) as a plain function — the dryrun must self-configure a virtual
8-device CPU backend rather than assert on the device count
(reference distribution contract: scripts/zero2.json:16-22 semantics).
"""

import os
import subprocess
import sys

import pytest

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    """With 8 virtual devices already present (conftest), runs directly."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


@pytest.mark.slow
def test_dryrun_multichip_respawns_when_devices_short():
    """Driver scenario: jax initialized with 1 device before the call."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # no virtual devices: force the respawn path
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('RESPAWN_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RESPAWN_OK" in proc.stdout
    assert "mesh={'data': 4, 'model': 2}" in proc.stdout
