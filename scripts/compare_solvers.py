#!/usr/bin/env python3
"""Benchmark the example programs across solver and strategy choices.

Port of the reference's ``scripts/compare_solvers.py`` (same CLI surface and
table output) targeting the Python example modules instead of CMake-built
binaries: each cell runs ``python -m multi_agent_solver_tpu.examples.<name>``
and parses the last ``cost=... time_ms=...`` stdout line
(reference: compare_solvers.py:120-134).

Cell status semantics (beyond the reference, which only checks exit codes):

* ``ok``        -- ran, produced a result line, cost finite and at most the
                   example's sanity bound (SANITY_BOUNDS below);
* ``diverged``  -- ran "successfully" but the cost exceeds the sanity bound
                   (a cost explosion must not count as a passing cell);
* ``failed``    -- ran but the cost is non-finite (nan/inf);
* ``exit N`` / ``timeout`` / ``no result line`` -- process-level failures.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Optional

REPO_ROOT = Path(__file__).resolve().parents[1]

MULTI_AGENT_EXAMPLES = {"multi_agent_lqr", "multi_agent_single_track"}
SINGLE_AGENT_EXAMPLES = {"single_track_ocp", "pendulum_swing_up",
                         "rocket_max_altitude", "cartpole_swing_up"}
ALL_EXAMPLES = tuple(sorted(MULTI_AGENT_EXAMPLES | SINGLE_AGENT_EXAMPLES))

# Largest plausible converged cost per example; orders of magnitude above
# every solver's legitimate answer (docs/RESULTS.md) but far below the cost
# explosions a diverged run produces (the round-2 rocket collocation cell
# reported 1.2e24 as "ok").  A finite cost above the bound demotes the cell
# to "diverged".
SANITY_BOUNDS = {
    "multi_agent_lqr": 1e5,
    "multi_agent_single_track": 1e6,
    "single_track_ocp": 1e5,
    "pendulum_swing_up": 1e5,
    "rocket_max_altitude": 1e4,
    "cartpole_swing_up": 1e4,
}


@dataclass
class RunResult:
    example: str
    solver: str
    strategy: Optional[str]
    cost: Optional[str]
    time_ms: Optional[str]
    status: str


def parse_arguments(argv: Optional[Iterable[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--examples", nargs="*", default=list(ALL_EXAMPLES),
                        choices=ALL_EXAMPLES)
    parser.add_argument("--solvers", nargs="+",
                        default=["ilqr", "cgd", "osqp", "osqpcollocation",
                                 "mppi"])
    parser.add_argument("--strategies", nargs="+",
                        default=["centralized", "sequential", "linesearch", "trustregion"])
    parser.add_argument("--agents", type=int, default=10)
    parser.add_argument("--max-outer", dest="max_outer", type=int, default=10)
    parser.add_argument("--timeout", type=float, default=None)
    parser.add_argument("--fail-fast", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--platform", default=None,
                        help="JAX platform to pin (e.g. cpu); default inherits.")
    parser.add_argument("--retries", type=int, default=1,
                        help="Re-run a cell on transient backend failures "
                             "(remote-TPU tunnels drop requests occasionally).")
    parser.add_argument("--json", default=None,
                        help="Also write every cell to this JSON artifact "
                             "(the TPUMATRIX format).")
    return parser.parse_args(argv)


def find_result_line(output: str) -> Optional[str]:
    for line in reversed(output.splitlines()):
        if "cost=" in line and "time_ms=" in line:
            return line.strip()
    return None


def parse_result_line(line: str) -> Dict[str, str]:
    data: Dict[str, str] = {}
    for token in line.split():
        if "=" in token:
            key, value = token.split("=", 1)
            data[key] = value
    return data


def run_example(example: str, args, solver: str, strategy: Optional[str]) -> RunResult:
    result = _run_example_once(example, args, solver, strategy)
    # "exit N" from a backend/tunnel hiccup (FAILED_PRECONDITION etc.) is
    # transient on remote TPUs; a timeout or "no result line" is not.
    for _ in range(max(0, args.retries)):
        if result.status == "ok" or not result.status.startswith("exit"):
            break
        if args.verbose:
            print(f"  retrying {example}/{solver}/{strategy} after {result.status}")
        result = _run_example_once(example, args, solver, strategy)
    return result


def _run_example_once(example: str, args, solver: str, strategy: Optional[str]) -> RunResult:
    cmd = [sys.executable, "-m", f"multi_agent_solver_tpu.examples.{example}",
           "--solver", solver]
    if strategy is not None:
        cmd += ["--strategy", strategy, "--agents", str(args.agents),
                "--max-outer", str(args.max_outer)]
    env = dict(os.environ)
    if args.platform:
        env["JAX_PLATFORMS"] = args.platform
    if args.verbose:
        print("$", " ".join(cmd))
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=args.timeout, check=False,
                              cwd=REPO_ROOT, env=env)
    except subprocess.TimeoutExpired:
        return RunResult(example, solver, strategy, None, None, "timeout")
    if args.verbose and proc.stderr:
        sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        return RunResult(example, solver, strategy, None, None,
                         f"exit {proc.returncode}")
    line = find_result_line(proc.stdout)
    if line is None:
        return RunResult(example, solver, strategy, None, None, "no result line")
    data = parse_result_line(line)
    status = "ok"
    try:
        cost_val = float(data.get("cost", "nan"))
    except ValueError:
        cost_val = float("nan")
    if cost_val != cost_val or cost_val in (float("inf"), float("-inf")):
        status = "failed"
    elif cost_val > SANITY_BOUNDS.get(example, float("inf")):
        status = "diverged"
    return RunResult(example, solver, strategy, data.get("cost"),
                     data.get("time_ms"), status)


def print_table(title: str, rows: List[RunResult], with_strategy: bool) -> None:
    print(f"\n== {title} ==")
    if with_strategy:
        header = f"{'strategy':<14} {'solver':<18} {'cost':>16} {'time_ms':>12}  status"
    else:
        header = f"{'solver':<18} {'cost':>16} {'time_ms':>12}  status"
    print(header)
    print("-" * len(header))
    for r in rows:
        cost = r.cost if r.cost is not None else "-"
        t = r.time_ms if r.time_ms is not None else "-"
        if with_strategy:
            print(f"{r.strategy or '-':<14} {r.solver:<18} {cost:>16} {t:>12}  {r.status}")
        else:
            print(f"{r.solver:<18} {cost:>16} {t:>12}  {r.status}")


def write_json(path: str, args, all_rows: List[RunResult]) -> None:
    import datetime
    import json

    import jax

    payload = {
        "backend": jax.default_backend(),
        "date": datetime.date.today().isoformat(),
        "cells_total": len(all_rows),
        "cells_ok": sum(r.status == "ok" for r in all_rows),
        "agents": args.agents,
        "max_outer": args.max_outer,
        "cells": [
            {"example": r.example, "strategy": r.strategy, "solver": r.solver,
             "cost": r.cost, "time_ms": r.time_ms, "status": r.status}
            for r in all_rows
        ],
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


def main(argv: Optional[Iterable[str]] = None) -> int:
    args = parse_arguments(argv)
    failed = False
    all_rows: List[RunResult] = []
    for example in args.examples:
        rows: List[RunResult] = []
        if example in MULTI_AGENT_EXAMPLES:
            for strategy in args.strategies:
                for solver in args.solvers:
                    r = run_example(example, args, solver, strategy)
                    rows.append(r)
                    if r.status != "ok":
                        failed = True
                        if args.fail_fast:
                            print_table(example, rows, True)
                            return 1
            print_table(example, rows, True)
            all_rows.extend(rows)
        else:
            for solver in args.solvers:
                r = run_example(example, args, solver, None)
                rows.append(r)
                if r.status != "ok":
                    failed = True
                    if args.fail_fast:
                        print_table(example, rows, False)
                        return 1
            print_table(example, rows, False)
            all_rows.extend(rows)
    if args.json:
        write_json(args.json, args, all_rows)
    return 1 if failed and args.fail_fast else 0


if __name__ == "__main__":
    raise SystemExit(main())
