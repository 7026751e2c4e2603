"""PCD (pressure-convection-diffusion) Schur complement approximations.

The TPU-native re-implementation of
``fenapack/preconditioners.py::PCDPC_BRM1`` / ``PCDPC_BRM2`` (SURVEY.md
sections 0 and 3.4).  Instead of petsc4py python-PC contexts wired into
PCFieldSplit, a PCD here is a pure function ``z_p = pcd(r_p)`` composed from
subsolve closures; the wind-dependent Kp matrix is a plain argument so the
whole preconditioner re-jits nothing when the wind changes.

Math (signs as in the reference; 1/nu scaling folded into Mp and Kp):

  BRM1 (Elman/Kay-Loghin-Wathen flavor; pressure BCs on the *inflow*):
      x_hat <- chop(x)                  # zero rows at bcs_pcd dofs
      w1 <- Ap_bc^{-1} x_hat
      y  <- -Mp^{-1} (x + Kp w1)

  BRM2 (Olshanskii-Vassilevski flavor; pressure BCs on the *outflow*,
        Kp includes the inflow surface term -(1/nu)(w.n) p q ds):
      w1 <- Mp^{-1} x
      w2 <- chop(Kp w1)
      y  <- -(w1 + Ap_bc^{-1} w2)

The Ap solve with Dirichlet rows is realized as the symmetric masked
operator ``free Ap free + I_bc`` so SPD subsolvers (Chebyshev/multigrid/
Cholesky) apply; with a zeroed right-hand side at bc dofs this is equivalent
to the reference's nonsymmetric row elimination.

For enclosed flows (no pcd BCs) the constant nullspace is projected out
around the Ap solve — the analogue of fenapack attaching a constant
nullspace to the Ap KSP (SURVEY.md section 2.1 item 4).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..ops.sparse import ELL


def make_pcd_apply(variant: str, ap_solve: Callable, mp_solve: Callable,
                   bc_mask: Optional[jnp.ndarray],
                   nullspace: bool = False,
                   active: Optional[jnp.ndarray] = None,
                   theta: float = 1.0, inv_dt: float = 0.0) -> Callable:
    """Build ``pcd(kp: ELL, r_p) -> z_p``.

    ``ap_solve``/``mp_solve`` approximate Ap^{-1} (with BC masking built in)
    and Mp^{-1}.  ``bc_mask`` is the pcd-BC dof mask (1.0 at Dirichlet dofs)
    or None when the problem has no pcd BCs (enclosed flow).  ``active`` is
    the real-dof mask (0.0 on alignment-padding dofs) used by the nullspace
    projection; None means all dofs are real.

    ``theta``/``inv_dt`` extend the applies to the unsteady theta-scheme
    (SURVEY.md section 0: "unsteady problems add Mp/dt into Fp"): with
    Fp = Mp/dt + theta (nu Ap + Kp) and the 1/nu-scaled Mp_s/Kp_s,

      BRM1:  -Mp^-1 Fp Ap^-1  = -(theta Mp_s^-1 (I + Kp_s Ap^-1)
                                  + inv_dt Ap^-1)
      BRM2:  -Ap^-1 Fp Mp^-1  = -(theta Mp_s^-1 ... transposed order,
                                  + inv_dt Ap^-1) — see apply bodies.

    Steady case: theta=1, inv_dt=0 reduces to the reference applies.
    """
    if bc_mask is not None:
        free = 1.0 - bc_mask
    else:
        free = None

    def chop(x):
        return x * free if free is not None else x

    if active is None:
        def project(x):
            if nullspace:
                return x - jnp.mean(x)
            return x
    else:
        n_active = jnp.sum(active)

        def project(x):
            if nullspace:
                return x - (jnp.sum(x * active) / n_active) * active
            return x

    def ap_inv(x):
        if nullspace:
            return project(ap_solve(project(x)))
        return ap_solve(x)

    if variant == "BRM1":
        def apply(kp: ELL, x: jnp.ndarray) -> jnp.ndarray:
            w1 = ap_inv(chop(x))
            return project(-(theta * mp_solve(x + kp.mv(w1)) + inv_dt * w1))
    elif variant == "BRM2":
        def apply(kp: ELL, x: jnp.ndarray) -> jnp.ndarray:
            w1 = mp_solve(x)
            w2 = chop(theta * kp.mv(w1) + inv_dt * x)
            return project(-(theta * w1 + ap_inv(w2)))
    else:
        raise ValueError(f"unknown PCD variant {variant!r}")
    return apply
