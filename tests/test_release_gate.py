"""Pre-round release gate (VERDICT r5 #6): the full oracle sweep at sf0.1.

The r5 float-determinism save (`x_embed_centroids` diverging only at
sf0.1 — accumulation order + library rounding) came from running
`tools/check_oracle.py` at sf0.1 voluntarily; this encodes it as a
one-command gate. It is SLOW (~15 min: 102 queries × Spark + DuckDB at
10× the driver's correctness scale), so it only runs when opted in:

    SPARK_GRAFT_SLOW=1 python -m pytest tests/test_release_gate.py

or, equivalently, straight from the shell (same code path):

    python tools/check_oracle.py /root/testdata/sf0.1
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="release gate is opt-in: set SPARK_GRAFT_SLOW=1 (or run "
    "tools/check_oracle.py /root/testdata/sf0.1 directly)",
)
@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 testdata absent")
def test_full_oracle_sweep_at_sf01():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "check_oracle.py"), SF01],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=repo,
    )
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    assert proc.returncode == 0, f"sf0.1 oracle sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
