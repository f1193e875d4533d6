"""CLI for exporting solve programs to the native serving runtime.

Usage::

    python -m multi_agent_solver_tpu.utils.export_cli --out /tmp/solve \
        --batch 1024 --horizon 80
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True, help="Artifact path prefix.")
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--horizon", type=int, default=80)
    args = parser.parse_args(argv)

    from .export import export_mpc_solve

    meta = export_mpc_solve(args.out, batch=args.batch, horizon=args.horizon)
    print(f"exported {args.out}.mlir")
    print(f"inputs:  {meta['inputs']}")
    print(f"outputs: {meta['outputs']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
