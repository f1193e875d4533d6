#!/usr/bin/env python3
"""Run an example and render a GIF animation of the solution.

Port of the reference's ``scripts/animate_example.py``: reuses the CSV
parsing from plot_example and provides writers for the pendulum (rod),
single-track examples (cars on the r=20 circular track), and rocket
(altitude marker), mirroring animate_example.py:17-206.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from plot_example import EXAMPLES, parse_sections, run_example  # noqa: E402

TRACK_RADIUS = 20.0  # multi_agent_single_track constant


def _animation(fig, update, frames, save_path, fps=20):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import animation

    anim = animation.FuncAnimation(fig, update, frames=frames, interval=1000 / fps)
    anim.save(save_path, writer="pillow", fps=fps)
    print(f"saved {save_path}")


def animate_pendulum(sections, save_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    headers, data = sections["pendulum_states"]
    theta = data[:, 1]
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.set_xlim(-1.4, 1.4)
    ax.set_ylim(-1.4, 1.4)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    (rod,) = ax.plot([], [], "o-", lw=3)

    def update(i):
        # theta = 0 is upright in this model.
        x = np.sin(theta[i])
        y = np.cos(theta[i])
        rod.set_data([0, x], [0, y])
        return (rod,)

    _animation(fig, update, len(theta), save_path)


def animate_single_track(sections, save_path, circular: bool):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    state_secs = {k: v for k, v in sections.items() if k.endswith("_states")}
    trajs = [data for _, data in state_secs.values()]
    n_frames = min(d.shape[0] for d in trajs)

    fig, ax = plt.subplots(figsize=(6, 6))
    if circular:
        phi = np.linspace(0, 2 * np.pi, 200)
        ax.plot(TRACK_RADIUS * np.cos(phi), TRACK_RADIUS * np.sin(phi), "k--", alpha=0.4)
        lim = TRACK_RADIUS * 1.4
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
    else:
        all_x = np.concatenate([d[:, 1] for d in trajs])
        all_y = np.concatenate([d[:, 2] for d in trajs])
        ax.set_xlim(all_x.min() - 1, all_x.max() + 1)
        ax.set_ylim(all_y.min() - 1, all_y.max() + 1)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)

    dots = [ax.plot([], [], "o", markersize=8)[0] for _ in trajs]
    trails = [ax.plot([], [], "-", alpha=0.5)[0] for _ in trajs]

    def update(i):
        for dot, trail, data in zip(dots, trails, trajs):
            dot.set_data([data[i, 1]], [data[i, 2]])
            trail.set_data(data[: i + 1, 1], data[: i + 1, 2])
        return dots + trails

    _animation(fig, update, n_frames, save_path, fps=10)


def animate_rocket(sections, save_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    headers, data = sections["rocket_states"]
    t, h = data[:, 0], data[:, 1]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 5), width_ratios=[1, 3])
    ax1.set_xlim(-1, 1)
    ax1.set_ylim(min(0, h.min()), h.max() * 1.1 + 1)
    ax1.set_xticks([])
    ax1.set_ylabel("altitude [m]")
    (marker,) = ax1.plot([], [], "r^", markersize=14)
    ax2.plot(t, h, alpha=0.4)
    (dot,) = ax2.plot([], [], "ro")
    ax2.set_xlabel("time [s]")
    ax2.grid(True, alpha=0.3)

    def update(i):
        marker.set_data([0], [h[i]])
        dot.set_data([t[i]], [h[i]])
        return marker, dot

    _animation(fig, update, len(t), save_path, fps=10)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("example", choices=EXAMPLES)
    parser.add_argument("--save", default=None)
    parser.add_argument("--platform", default=None)
    args, extra = parser.parse_known_args(argv)
    extra = [a for a in extra if a != "--"]
    output = run_example(args.example, extra, args.platform)
    sections = parse_sections(output)
    save = args.save or f"{args.example}.gif"

    if args.example == "pendulum_swing_up":
        animate_pendulum(sections, save)
    elif args.example == "rocket_max_altitude":
        animate_rocket(sections, save)
    elif args.example == "multi_agent_single_track":
        animate_single_track(sections, save, circular=True)
    else:
        animate_single_track(sections, save, circular=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
