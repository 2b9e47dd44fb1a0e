"""Damped normal-equation solver for ill-posed least-squares systems.

Implements the "iteration by correcting characteristic value" (ICCV) scheme used
to fit the 78-unknown inverse-RPC rational polynomial (reference:
/root/reference/tools/iccv_solver.py:10-39).  Host-side NumPy in float64 — this
runs once per camera at data-preparation time, never in the jitted hot path.

The iteration solves (A^T A + k I) x_{t+1} = A^T l + k x_t, which converges to
the unregularized normal-equation solution while keeping each linear solve well
conditioned.
"""

from __future__ import annotations

import numpy as np


def solve_iccv(
    ata: np.ndarray,
    atl: np.ndarray,
    damping: float = 1.0,
    tol: float = 1e-10,
    max_iter: int = 1000,
) -> tuple[np.ndarray, int]:
    """Iteratively solve the damped normal equations.

    Args:
      ata: (n, n) normal matrix A^T A.
      atl: (n,) right-hand side A^T l.
      damping: Tikhonov damping factor k added to the diagonal.
      tol: max-abs update threshold for convergence.
      max_iter: iteration cap.

    Returns:
      (x, iterations): solution vector and the number of iterations used.
    """
    ata = np.asarray(ata, dtype=np.float64)
    atl = np.asarray(atl, dtype=np.float64)
    n = ata.shape[0]
    if ata.shape != (n, n):
        raise ValueError(f"normal matrix must be square, got {ata.shape}")

    damped = ata + damping * np.eye(n)
    # Factor once: the damped matrix is constant across iterations, only the
    # right-hand side changes — O(n^3) once + O(n^2) per iteration.
    try:
        import scipy.linalg as sla

        lu_piv = sla.lu_factor(damped)

        def solve(rhs: np.ndarray) -> np.ndarray:
            return sla.lu_solve(lu_piv, rhs)

    except ImportError:  # pragma: no cover - scipy is available in this image

        def solve(rhs: np.ndarray) -> np.ndarray:
            return np.linalg.solve(damped, rhs)

    x = np.zeros(n, dtype=np.float64)
    rhs = atl.copy()
    iterations = 0
    for iterations in range(1, max_iter + 1):
        x_next = solve(rhs)
        if np.max(np.abs(x_next - x)) < tol:
            x = x_next
            break
        x = x_next
        rhs = atl + damping * x
    return x, iterations
