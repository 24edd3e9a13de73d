"""Multi-host (multi-process) Merkle forest: spawns 2 real OS processes,
federates their CPU devices into one global mesh via jax.distributed + gloo
collectives (the DCN-equivalent transport), and asserts every process
computes the same forest root as the single-process golden reduction.

This is the round-1 VERDICT item 3 regression gate: the demo must FAIL
(nonzero exit) if federation does not come up -- tools/multihost_demo.py
exits 2 on the no-federation path.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# ~7 min wall (two processes each XLA:CPU-compile the tree reduction);
# opt-in locally, always on in CI via the dedicated multihost job.
pytestmark = pytest.mark.skipif(
    not os.environ.get("ANEMOI_MULTIHOST"),
    reason="2-process federation test is slow; set ANEMOI_MULTIHOST=1",
)


def test_two_process_forest_root():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
         "--procs", "2", "--leaves", "64", "--port", "19891"],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, (
        f"multihost demo failed rc={res.returncode}\n"
        f"stdout: {res.stdout}\nstderr: {res.stderr[-2000:]}"
    )
    assert "OK" in res.stdout
    for i in range(2):
        log = Path(f"/tmp/multihost_worker_{i}.log").read_text()
        assert "root match: True" in log, f"worker {i}:\n{log[-2000:]}"
