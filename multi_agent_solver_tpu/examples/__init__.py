"""Example programs mirroring the reference's five example binaries.

Run as modules, e.g.::

    python -m multi_agent_solver_tpu.examples.single_track_ocp --solver ilqr
    python -m multi_agent_solver_tpu.examples.multi_agent_lqr --agents 4 \
        --strategy sequential
"""
