"""Multi-host (DCN) mesh gate: 2 processes x 4 virtual CPU devices each,
joined via jax.distributed (elodin_tpu.parallel.init_multihost), running a
sharded training step whose dp axis crosses the process boundary.  SURVEY
§2 parallelism item 4 ("shard_map across devices/hosts"); SCALING.md
documents the dp-over-DCN / ep-over-ICI placement this emulates."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multihost ok" in proc.stdout, proc.stdout[-2000:]
