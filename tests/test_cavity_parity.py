"""Cavity (enclosed flow) golden-parity: BASELINE config 2 evidence.

The lid-driven cavity exercises both PCD BC variants in their enclosed
forms: BRM1 pins pressure on the lid ("inflow"), BRM2 has NO pressure
Dirichlet dofs (pure-Neumann Ap + constant-nullspace projection — the path
where fenapack attaches a PETSc constant nullspace).  Iteration counts must
match the scipy exact-LU oracle within the BASELINE 10% band.
"""
import json
import os

import numpy as np
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_counts.json")


@pytest.mark.parametrize("variant", ["BRM1", "BRM2"])
def test_cavity_matches_oracle_counts(variant):
    with open(GOLDEN) as f:
        golden = json.load(f)[f"cavity/l0/{variant}/picard"]["linear_iters"]

    mesh = meshmod.cavity_mesh(0)
    asm = NSAssembler(mesh, 0.02)          # Re = 50

    def lid(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 1.0
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], lid)]
    cfg = overrides(SolverConfig(), {"pcd.variant": variant})
    nl = NonlinearSolver(asm, bcs, cfg, enclosed=True)
    res = nl.solve(rtol=1e-4, max_steps=len(golden) + 2)
    for ours, ref in zip(res.linear_iters, golden):
        assert abs(ours - ref) <= max(1, 0.1 * ref), (res.linear_iters,
                                                      golden)


def test_cavity_re500_continuation():
    """BASELINE config 2 at its nominal Reynolds number: Re=500 via 2x
    Reynolds continuation (undamped Picard oscillates there — the demo's
    documented driver), Newton at each stage, BRM2 pure-Neumann nullspace
    path.  Physics checks: converged, velocity bounded by the lid speed,
    and the enclosed-flow solution conserves mass."""
    import jax.numpy as jnp

    mesh = meshmod.cavity_mesh(1)

    def lid(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 1.0
        return v

    w = None
    for Re in (100.0, 200.0, 400.0, 500.0):
        asm = NSAssembler(mesh, 1.0 / Re)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], lid)]
        cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                         "krylov.maxiter": 150})
        nl = NonlinearSolver(asm, bcs, cfg, linearization="newton",
                             enclosed=True)
        res = nl.solve(w, rtol=1e-5, max_steps=30)
        assert res.converged, (Re, res.nonlinear_res)
        w = res.w
    assert max(res.linear_iters) < 150, res.linear_iters
    wnp = np.asarray(res.w)
    n2 = asm.n2
    assert np.abs(wnp[:2 * n2]).max() <= 1.0 + 1e-6, \
        np.abs(wnp[:2 * n2]).max()
    div = sum(np.asarray(asm.const.D[a].mv(
        jnp.asarray(wnp[a * n2:(a + 1) * n2]))) for a in range(2))
    assert np.abs(div).max() < 1e-9, np.abs(div).max()
