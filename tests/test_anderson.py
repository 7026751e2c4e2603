"""Anderson-accelerated Picard (beyond-reference nonlinear acceleration)."""
import numpy as np
import jax.numpy as jnp

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver


def build(level=0):
    mesh = meshmod.backward_step_mesh(level)
    asm = NSAssembler(mesh, 0.02, dtype=jnp.float64)

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "dtype": "float64",
                                     "krylov.rtol": 1e-8})
    return NonlinearSolver(asm, bcs, cfg)


def test_anderson_converges_with_fewer_steps():
    plain = build().solve_fused(rtol=1e-5)
    acc = build().solve_anderson(m=4, rtol=1e-5)
    assert acc.converged and plain.converged
    assert len(acc.linear_iters) <= len(plain.linear_iters)
    assert acc.total_linear_iters < plain.total_linear_iters


def test_fused_anderson_matches_host_loop():
    """make_full_solve(anderson=m) is the device-fused twin of
    solve_anderson: same mixing math (history in the while_loop carry,
    Gram from unrolled on-device dots) -> same steps, same solution."""
    nl = build()
    host = nl.solve_anderson(m=4, rtol=1e-5)
    full = nl.make_full_solve(rtol=1e-5, max_steps=25, anderson=4)
    w, k, iters, _ = full(nl.initial_state().astype(jnp.float64))
    k = int(k)
    iters = [int(i) for i in np.asarray(iters)[:k]]
    assert host.converged
    assert len(iters) == len(host.linear_iters)
    # identical mixing up to roundoff in the tiny Gram solve
    assert abs(sum(iters) - sum(host.linear_iters)) <= 2, (
        iters, host.linear_iters)
    nd = (float(jnp.linalg.norm(w - host.w))
          / float(jnp.linalg.norm(host.w)))
    assert nd < 1e-6, nd


def test_anderson_same_solution_as_picard():
    a = build().solve_fused(rtol=1e-8, max_steps=40)
    b = build().solve_anderson(m=4, rtol=1e-8, max_steps=40)
    assert a.converged and b.converged
    # same discrete solution (velocity part; pressure up to tight tol too)
    na = float(jnp.linalg.norm(a.w))
    diff = float(jnp.linalg.norm(a.w - b.w)) / na
    assert diff < 1e-6, diff
