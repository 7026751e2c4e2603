"""Method of manufactured solutions: END-TO-END spatial convergence.

The golden-operator tests check assembly entrywise and the parity tests
check iteration counts; this is the remaining axis — the full nonlinear
solver must converge to an exact analytic Navier-Stokes solution at the
finite-element rates (P2 velocity ~h^3 nodal, P1 pressure ~h^2) as the
mesh refines.  Exercises the body-force path (``NSAssembler.set_body_force``)
the reference expresses inside its UFL linear form L.

Exact solution on the unit square (divergence-free, u.n = 0 on the whole
boundary -> enclosed/nullspace path):

    u = ( sin(pi x) cos(pi y), -cos(pi x) sin(pi y) )
    p = sin(pi x) sin(pi y)
    f = -nu lap(u) + (u.grad)u + grad p
      = ( 2 nu pi^2 u1 + (pi/2) sin(2 pi x) + pi cos(pi x) sin(pi y),
          2 nu pi^2 u2 + (pi/2) sin(2 pi y) + pi sin(pi x) cos(pi y) )
"""
import numpy as np
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver

NU = 1.0


def u_exact(x):
    s_x, c_x = np.sin(np.pi * x[:, 0]), np.cos(np.pi * x[:, 0])
    s_y, c_y = np.sin(np.pi * x[:, 1]), np.cos(np.pi * x[:, 1])
    return np.stack([s_x * c_y, -c_x * s_y], axis=1)


def p_exact(x):
    return np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])


def body_force(x):
    s_x, c_x = np.sin(np.pi * x[:, 0]), np.cos(np.pi * x[:, 0])
    s_y, c_y = np.sin(np.pi * x[:, 1]), np.cos(np.pi * x[:, 1])
    pi = np.pi
    f1 = (2 * NU * pi**2 * s_x * c_y + 0.5 * pi * np.sin(2 * pi * x[:, 0])
          + pi * c_x * s_y)
    f2 = (-2 * NU * pi**2 * c_x * s_y + 0.5 * pi * np.sin(2 * pi * x[:, 1])
          + pi * s_x * c_y)
    return np.stack([f1, f2], axis=1)


def solve_mms(n):
    mesh = meshmod.rectangle_mesh(0.0, 0.0, 1.0, 1.0, n, n)
    mesh.mark_boundary({meshmod.WALL:
                        lambda x: np.ones(x.shape[0], bool)},
                       overwrite=True)
    asm = NSAssembler(mesh, NU)
    asm.set_body_force(body_force)     # BEFORE solver construction (trace)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL], u_exact)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "krylov.rtol": 1e-10,
                                     "krylov.maxiter": 200})
    nl = NonlinearSolver(asm, bcs, cfg, enclosed=True)
    res = nl.solve(rtol=1e-8, max_steps=30)
    assert res.converged
    w = np.asarray(res.w)

    cu = asm.W.V.dof_coords()[:asm.n2_real]
    ue = u_exact(cu)
    eu = np.stack([w[:asm.n2][:asm.n2_real] - ue[:, 0],
                   w[asm.n2:2 * asm.n2][:asm.n2_real] - ue[:, 1]])
    err_u = np.sqrt(np.mean(eu**2))

    cp = asm.W.Q.dof_coords()[:asm.n1_real]
    ph = w[2 * asm.n2:][:asm.n1_real]
    pe = p_exact(cp)
    dp = (ph - ph.mean()) - (pe - pe.mean())   # pressure mod constants
    err_p = np.sqrt(np.mean(dp**2))
    return err_u, err_p


def test_mms_spatial_convergence():
    eu8, ep8 = solve_mms(8)
    eu16, ep16 = solve_mms(16)
    # P2 velocity: nodal error ~h^3 (ratio 8); P1 pressure: ~h^2 (ratio 4)
    assert eu8 / eu16 > 6.0, (eu8, eu16)
    assert ep8 / ep16 > 3.0, (ep8, ep16)
    # absolute sanity: the coarse solve is already accurate
    assert eu8 < 5e-3 and ep8 < 5e-2, (eu8, ep8)


def test_custom_coefficients_body_force():
    """The custom-forms path expresses the same body force through an extra
    Coefficient (``PCDAssembler(coefficients=...)``) — for a polynomial f
    (P2-representable, quadrature-exact) its rhs_vector must match the
    factored set_body_force residual entrywise."""
    import jax.numpy as jnp
    from fenapack_tpu.fem.dofmap import TaylorHood
    from fenapack_tpu.fem import forms as F
    from fenapack_tpu.solvers.custom import PCDAssembler

    def poly_force(x):
        return np.stack([x[:, 0]**2, x[:, 0] * x[:, 1]], axis=1)

    mesh = meshmod.rectangle_mesh(0.0, 0.0, 1.0, 1.0, 4, 4)
    mesh.mark_boundary({meshmod.WALL:
                        lambda x: np.ones(x.shape[0], bool)},
                       overwrite=True)

    asm = NSAssembler(mesh, NU)
    asm.set_body_force(poly_force)

    W = TaylorHood(mesh)
    (u, p) = F.TrialFunctions(W)
    (v, q) = F.TestFunctions(W)
    w = F.Coefficient(W, "w")
    u_, p_ = F.split(w)
    f = F.Coefficient(W, "f")
    f_u, _ = F.split(f)
    L = (NU * F.inner(F.grad(u_), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u_), u_), v) * F.dx
         - p_ * F.div(v) * F.dx
         - q * F.div(u_) * F.dx
         + (-1.0) * F.dot(f_u, v) * F.dx)
    J = (NU * F.inner(F.grad(u), F.grad(v)) * F.dx
         - p * F.div(v) * F.dx - q * F.div(u) * F.dx)

    fvals = np.zeros(2 * W.n2 + W.n1)
    cu = W.V.dof_coords()
    fv = poly_force(cu)
    fvals[:W.n2] = fv[:, 0]
    fvals[W.n2:2 * W.n2] = fv[:, 1]

    ca = PCDAssembler(J, L, [], w=w,
                      coefficients={"f": jnp.asarray(fvals)})

    rng = np.random.default_rng(7)
    x = rng.standard_normal(2 * W.n2 + W.n1) * 0.1
    rv = np.asarray(ca.rhs_vector(jnp.asarray(x)))
    ru, rp = asm.residual(jnp.asarray(x[:2 * asm.n2]),
                          jnp.asarray(x[2 * asm.n2:]))
    ref = np.concatenate([np.asarray(ru), np.asarray(rp)])
    assert np.allclose(rv, ref, atol=1e-10), np.abs(rv - ref).max()


def test_mms_3d_spatial_convergence():
    """3D (tet) MMS: the 2D manufactured field extended z-invariantly
    (third component 0, still divergence-free, u.n = 0 on all faces of the
    unit cube) — exercises every 3D element tensor end-to-end."""
    from fenapack_tpu.fem import mesh3d

    def u3(x):
        u = np.zeros((x.shape[0], 3))
        u[:, :2] = u_exact(x[:, :2])
        return u

    def f3(x):
        f = np.zeros((x.shape[0], 3))
        f[:, :2] = body_force(x[:, :2])
        return f

    def run(n):
        mesh = mesh3d.box_mesh(0, 0, 0, 1, 1, 1, n, n, n)
        mesh.mark_boundary({meshmod.WALL:
                            lambda x: np.ones(x.shape[0], bool)},
                           overwrite=True)
        asm = NSAssembler(mesh, NU, quad_degree=4)
        asm.set_body_force(f3)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL], u3)]
        cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                         "krylov.rtol": 1e-10,
                                         "krylov.maxiter": 200})
        nl = NonlinearSolver(asm, bcs, cfg, enclosed=True)
        res = nl.solve(rtol=1e-8, max_steps=30)
        assert res.converged
        w = np.asarray(res.w)
        cu = asm.W.V.dof_coords()[:asm.n2_real]
        ue = u3(cu)
        eu = np.stack([w[a * asm.n2:(a + 1) * asm.n2][:asm.n2_real]
                       - ue[:, a] for a in range(3)])
        cp = asm.W.Q.dof_coords()[:asm.n1_real]
        ph = w[3 * asm.n2:][:asm.n1_real]
        pe = p_exact(cp[:, :2])
        dp = (ph - ph.mean()) - (pe - pe.mean())
        return np.sqrt(np.mean(eu**2)), np.sqrt(np.mean(dp**2))

    eu3, ep3 = run(3)
    eu6, ep6 = run(6)
    assert eu3 / eu6 > 5.0, (eu3, eu6)
    assert ep3 / ep6 > 3.0, (ep3, ep6)
