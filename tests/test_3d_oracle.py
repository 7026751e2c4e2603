"""3D golden iteration counts (BASELINE config 4 math validation).

The from-scratch scipy oracle (tests/reference_fem) is 2D-only; 3D operator
exactness is covered by patch tests (test_3d.py).  This test closes the
remaining gap — SOLVER-level 3D golden counts — by running an exact-LU PCD
fieldsplit FGMRES entirely in scipy on the (patch-test-validated) assembled
tet Taylor-Hood operators, independently of fenapack_tpu's Krylov,
fieldsplit and subsolve code, and comparing iteration counts against the
JAX path with exact (dense-LU) subsolves.  Reference-parity: the
``--ls direct`` path of fenapack's demo (MUMPS-exact subsolves).
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from fenapack_tpu.fem import mesh3d, mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from tests.reference_fem.oracle import fgmres


def duct_inflow(x):
    v = np.zeros((x.shape[0], 3))
    v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
    return v


def to_csr(pat, flat_vals, shape):
    vn = np.asarray(flat_vals).reshape(-1)[np.asarray(pat._upos)]
    return sp.csr_matrix((vn, (np.asarray(pat._urow), np.asarray(pat._ucol))),
                         shape=shape)


def mask_sym(A, mask):
    free = sp.diags(1.0 - mask)
    return free @ A @ free + sp.diags(mask)


@pytest.mark.parametrize("variant", ["BRM2", "BRM1"])
def test_3d_duct_counts_match_scipy_exact_pcd(variant):
    nu = 0.1
    mesh = mesh3d.channel_mesh3d(0, length=2.0)
    asm = NSAssembler(mesh, nu, dtype=jnp.float64, quad_degree=4)
    d, n2, n1 = 3, asm.n2, asm.n1
    n_u = d * n2

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], duct_inflow)]
    cfg = overrides(SolverConfig(), {
        "pcd.variant": variant, "dtype": "float64",
        "krylov.rtol": 1e-8, "krylov.maxiter": 200,
        "velocity.method": "lu", "pcd.ap.method": "lu",
        "pcd.mp.method": "lu"})
    nl = NonlinearSolver(asm, bcs, cfg)
    oseen = nl.oseen

    bc_mask_u = np.asarray(oseen.bc_mask_u)
    free_u = 1.0 - bc_mask_u
    mask_full = np.concatenate([bc_mask_u, np.zeros(n1)])

    # constant scipy operators (1/nu-scaled Mp matches the PCD convention)
    c = asm.const
    D_csr = [to_csr(asm.pat_div, c.D[a].vals, (n1, n2)) for a in range(d)]
    DT_csr = [to_csr(asm.pat_divT, c.DT[a].vals, (n2, n1)) for a in range(d)]
    Mp = to_csr(asm.pat_p1, c.Mp.vals, (n1, n1))
    pcd_mask = np.asarray(oseen.pcd_mask)
    Ap = mask_sym(to_csr(asm.pat_p1, c.Ap.vals, (n1, n1)), pcd_mask)
    Mp_lu = spla.splu(Mp.tocsc())
    Ap_lu = spla.splu(Ap.tocsc())
    free_p = 1.0 - pcd_mask

    if variant == "BRM2":
        def pcd_apply(kp_csr, r_p):       # solvers/pcd.py semantics
            w1 = Mp_lu.solve(r_p)
            w2 = free_p * (kp_csr @ w1)
            return -(w1 + Ap_lu.solve(w2))
    else:
        def pcd_apply(kp_csr, r_p):       # BRM1: Ap first, inflow rows
            w1 = Ap_lu.solve(free_p * r_p)
            return -Mp_lu.solve(r_p + kp_csr @ w1)

    # Picard loop: ORACLE (scipy) solves drive the trajectory; at every
    # linearization point the JAX exact-subsolve path must take comparable
    # iterations on the identical system
    w = np.asarray(nl.initial_state())
    iters_scipy, iters_jax = [], []
    r0 = None
    for _ in range(12):
        F = np.asarray(nl._residual(jnp.asarray(w)))
        rn = np.linalg.norm(F)
        if r0 is None:
            r0 = rn
        if rn <= 1e-5 * r0:
            break
        wind = w[:n_u]
        A1vals, _ = oseen._operator_values(jnp.asarray(wind))
        A1 = to_csr(asm.pat_p2, A1vals, (n2, n2))
        Z = None
        J = sp.bmat([[A1 if a == b else Z for b in range(d)] + [DT_csr[a]]
                     for a in range(d)]
                    + [[D_csr[b] for b in range(d)] + [Z]], format="csr")
        Jm = mask_sym(J, mask_full).tocsr()
        A_uu_lu = spla.splu(Jm[:n_u, :n_u].tocsc())
        kp_csr = to_csr(asm.pat_p1,
                        asm.kp_values(jnp.asarray(wind),
                                      surface=(variant == "BRM2")),
                        (n1, n1))

        def fs_apply(r):
            r_u, r_p = r[:n_u], r[n_u:]
            z_p = pcd_apply(kp_csr, r_p)
            rhs = free_u * (r_u - np.concatenate(
                [DT_csr[a] @ z_p for a in range(d)]))
            z_u = free_u * A_uu_lu.solve(rhs) + bc_mask_u * r_u
            return np.concatenate([z_u, z_p])

        dx, k_scipy, _ = fgmres(lambda x: Jm @ x, -F, fs_apply,
                                rtol=1e-8, maxiter=200)
        iters_scipy.append(k_scipy)

        res = oseen.solve(jnp.asarray(wind), jnp.asarray(-F))
        assert bool(res.converged)
        iters_jax.append(int(res.iters))

        w = w + dx

    assert len(iters_scipy) >= 3
    total_s, total_j = sum(iters_scipy), sum(iters_jax)
    # the 10% band of BASELINE.md, extended to 3D
    assert abs(total_j - total_s) <= max(2, 0.1 * total_s), (
        iters_jax, iters_scipy)
