"""Fresh-subprocess runner for tests quarantined from long sessions.

See tests/conftest.py::pytest_collection_modifyitems -- the environment's
XLA:CPU backend segfaults inside ``backend_compile`` after ~40 minutes of
single-process compiles; the crash lands wherever the next fresh compile
happens to be (test_warm_workspace in round 1, test_qp_solvers once the
suite grew).  This module (named ``zz`` so it collects last) re-runs the
suite's quarantined back half in a clean interpreter, where it always
passes.  The conftest threshold keeps the subprocess itself from
re-quarantining (it collects fewer than threshold items).
"""

import os
import subprocess
import sys

QUARANTINED = (
    "test_qp_parity", "test_qp_scale", "test_qp_solvers",
    "test_quadratic_cost", "test_quadrotor", "test_riccati_assoc",
    "test_state_bounds_al", "test_strategies", "test_traj_qp",
    "test_warm_workspace",
)


def test_quarantined_back_half_in_fresh_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = [f"tests/{m}.py" for m in QUARANTINED]
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *files, "-q"],
        cwd=repo, capture_output=True, text=True, timeout=2700,
    )
    assert proc.returncode == 0, (
        f"quarantined-back-half subprocess failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
