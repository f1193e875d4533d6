"""Fresh-subprocess runner for tests quarantined from long sessions.

See tests/conftest.py::pytest_collection_modifyitems -- the environment's
XLA:CPU backend segfaults inside ``backend_compile`` after ~40 minutes of
single-process compiles, deterministically landing in test_warm_workspace
during full-suite runs.  This module (named ``zz`` so it collects last)
re-runs those tests in a clean interpreter, where they always pass.
"""

import os
import subprocess
import sys


def test_warm_workspace_in_fresh_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_warm_workspace.py", "-q"],
        cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"warm-workspace subprocess failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
