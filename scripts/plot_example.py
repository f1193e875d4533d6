#!/usr/bin/env python3
"""Run an example and plot its state/control trajectories.

Port of the reference's ``scripts/plot_example.py``: runs an example module,
parses the ``<base>_states`` / ``<base>_controls`` CSV sections from stdout
(protocol: example_utils.hpp:123-167), and renders matplotlib figures.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]

EXAMPLES = (
    "single_track_ocp",
    "pendulum_swing_up",
    "rocket_max_altitude",
    "multi_agent_lqr",
    "multi_agent_single_track",
    "cartpole_swing_up",
)


def parse_sections(output: str) -> Dict[str, Tuple[List[str], np.ndarray]]:
    """Parse all CSV sections: name -> (column headers, data [rows, cols])."""
    sections: Dict[str, Tuple[List[str], np.ndarray]] = {}
    lines = output.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.endswith("_states") or line.endswith("_controls"):
            name = line
            i += 1
            if i >= len(lines):
                break
            headers = lines[i].strip().split(",")
            rows = []
            i += 1
            while i < len(lines) and lines[i].strip():
                rows.append([float(v) for v in lines[i].strip().split(",")])
                i += 1
            sections[name] = (headers, np.asarray(rows))
        i += 1
    return sections


def run_example(example: str, extra_args: List[str], platform: Optional[str]) -> str:
    cmd = [sys.executable, "-m", f"multi_agent_solver_tpu.examples.{example}"] + extra_args
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False,
                          cwd=REPO_ROOT, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"example failed with exit code {proc.returncode}")
    return proc.stdout


def plot_sections(sections, title: str, save: Optional[str], show: bool) -> None:
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    state_secs = {k: v for k, v in sections.items() if k.endswith("_states")}
    control_secs = {k: v for k, v in sections.items() if k.endswith("_controls")}

    fig, (ax_s, ax_c) = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    for name, (headers, data) in state_secs.items():
        base = name[: -len("_states")]
        for j, h in enumerate(headers[1:], start=1):
            ax_s.plot(data[:, 0], data[:, j], label=f"{base}.{h}")
    ax_s.set_ylabel("states")
    ax_s.legend(loc="best", fontsize=7)
    ax_s.grid(True, alpha=0.3)

    for name, (headers, data) in control_secs.items():
        base = name[: -len("_controls")]
        for j, h in enumerate(headers[1:], start=1):
            ax_c.step(data[:, 0], data[:, j], where="post", label=f"{base}.{h}")
    ax_c.set_ylabel("controls")
    ax_c.set_xlabel("time [s]")
    ax_c.legend(loc="best", fontsize=7)
    ax_c.grid(True, alpha=0.3)

    fig.suptitle(title)
    fig.tight_layout()
    if save:
        fig.savefig(save, dpi=120)
        print(f"saved {save}")
    if show:
        plt.show()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("example", choices=EXAMPLES)
    parser.add_argument("--save", default=None, help="Save figure to this path.")
    parser.add_argument("--show", action="store_true", help="Open a window.")
    parser.add_argument("--platform", default=None)
    args, extra = parser.parse_known_args(argv)
    extra = [a for a in extra if a != "--"]
    output = run_example(args.example, extra, args.platform)
    sections = parse_sections(output)
    if not sections:
        raise SystemExit("no trajectory sections found in example output")
    save = args.save or (None if args.show else f"{args.example}.png")
    plot_sections(sections, args.example, save, args.show)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
