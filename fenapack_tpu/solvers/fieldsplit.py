"""Upper-triangular Schur fieldsplit preconditioner as function composition.

TPU-native replacement for PETSc ``PCFIELDSPLIT`` with
``pc_fieldsplit_type schur``, ``schur_fact_type upper``,
``schur_precondition user`` as configured by
``fenapack/field_split.py::PCDKrylovSolver`` (SURVEY.md section 2.2 item 3):

    P = [ A   B^T ]      P^{-1} r :  z_p = S_hat^{-1} r_p
        [ 0    S  ]                  z_u = A_hat^{-1} (r_u - B^T z_p)

where ``S_hat^{-1}`` is the PCD apply and ``A_hat^{-1}`` the velocity-block
subsolve.  The index-set plumbing of the reference
(``field_split_utils.py::dofmap_dofs_is``) is free here: the monolithic
vector is the concatenation ``[u_x; u_y; p]`` by construction, so the splits
are static slices.

Velocity Dirichlet dofs carry an identity block (symmetric elimination), so
the preconditioner maps ``z_u = r_u`` there.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def make_fieldsplit_upper(n_u: int, a_solve: Callable, schur_solve: Callable,
                          bt_mv: Callable, free_u: jnp.ndarray) -> Callable:
    """Compose the upper Schur fieldsplit PC.

    ``a_solve(r_u)`` approximates the (bc-masked) velocity block inverse,
    ``schur_solve(r_p)`` is the PCD apply (wind already bound),
    ``bt_mv(p)`` applies the gradient block B^T, ``free_u`` masks free
    velocity dofs (0 at Dirichlet dofs).
    """
    def apply(r: jnp.ndarray) -> jnp.ndarray:
        r_u, r_p = r[:n_u], r[n_u:]
        z_p = schur_solve(r_p)
        rhs = free_u * (r_u - bt_mv(z_p))
        z_u = free_u * a_solve(rhs) + (1.0 - free_u) * r_u
        return jnp.concatenate([z_u, z_p])
    return apply
