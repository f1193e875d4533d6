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

# Single source of truth for the module list: import the suite's conftest
# by path (tests/ has no __init__.py, so a plain import isn't guaranteed).
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_mas_tests_conftest",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "conftest.py"),
)
_conftest = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_conftest)
QUARANTINED = _conftest.QUARANTINED_MODULES


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
