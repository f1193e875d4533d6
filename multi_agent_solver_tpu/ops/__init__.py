"""Numerical building-block ops (batched linear algebra, Pallas kernels)."""

from .psd import cholesky_with_escalation, solve_psd_with_reg

__all__ = ["cholesky_with_escalation", "solve_psd_with_reg"]
