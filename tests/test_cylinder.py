"""Schafer-Turek DFG 2D-1 benchmark: flow around a cylinder at Re=20.

The strongest end-to-end physics validation available without the
reference stack (VERDICT round-1 item 5): drag/lift coefficients and the
front/back pressure difference of the steady cylinder flow against the
published benchmark intervals (Schafer & Turek 1996; upstream fenapack's
demo geometry comes from DOLFIN/mshr).

    c_D in [5.5700, 5.5900], c_L in [0.0104, 0.0110], dP in [0.1172, 0.1176]

The level-0 snapped-polygon mesh (h_fine = r/4 at the cylinder) cannot hit
the reference intervals exactly — the geometric error of the inscribed
polygon and the O(h^2) force error budget a few percent — so the solve
test asserts a documented band around them; the demo at higher level
reports the sharp values.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from fenapack_tpu.solvers import gmg
from fenapack_tpu.utils.functionals import boundary_reaction, eval_p1


def test_cylinder_mesh_geometry():
    """Mesh invariants: markers present, snapped vertices exactly on the
    circle, no degenerate cells, and refinement re-snaps new vertices."""
    coarse = meshmod.cylinder_channel_mesh(0)
    hier = gmg.build_hierarchy(coarse, 1, snap=meshmod.snap_to_circle)
    for mesh in hier.meshes:
        assert (mesh.facet_markers == meshmod.CYLINDER).sum() >= 20
        assert (mesh.facet_markers == meshmod.INFLOW).any()
        assert (mesh.facet_markers == meshmod.OUTFLOW).any()
        vids = np.unique(mesh.edges[mesh.boundary_facets[
            mesh.facet_markers == meshmod.CYLINDER]])
        d = np.linalg.norm(mesh.vertices[vids] - [0.2, 0.2], axis=1)
        assert np.abs(d - 0.05).max() < 1e-12
        assert meshmod.triangle_quality(mesh).min() > 0.05


def test_boundary_reaction_couette_wall_friction():
    """Analytic sign + magnitude anchor for boundary_reaction: Couette
    flow u = (y, 0), p = 0 on [0, L] x [0, 1] is an exact discrete
    Taylor-Hood state with zero convection AND zero traction on the
    inflow/outflow ends — so the corner dofs shared between end facets and
    walls pick up nothing, and the wall force is exact wall friction:
    the fluid drags the bottom wall downstream with F = (+nu L, 0) and
    the top wall backward with (-nu L, 0)."""
    nu, L = 0.1, 2.0
    mesh = meshmod.rectangle_mesh(0.0, 0.0, L, 1.0, 8, 4)
    tol = 1e-9
    BOT, TOP = 7, 8
    mesh.mark_boundary({
        meshmod.WALL: lambda x: np.ones(x.shape[0], dtype=bool),
        meshmod.INFLOW: lambda x: x[:, 0] < tol,
        meshmod.OUTFLOW: lambda x: x[:, 0] > L - tol,
        BOT: lambda x: x[:, 1] < tol,
        TOP: lambda x: x[:, 1] > 1.0 - tol,
    })
    asm = NSAssembler(mesh, nu, dtype=jnp.float64)
    xy = asm.W.V.dof_coords()
    ux = np.zeros(asm.n2)
    ux[:xy.shape[0]] = xy[:, 1]
    u = jnp.asarray(np.concatenate([ux, np.zeros(asm.n2)]))
    p = jnp.zeros(asm.n1)
    Fb = boundary_reaction(asm, u, p, [BOT])
    Ft = boundary_reaction(asm, u, p, [TOP])
    assert abs(Fb[0] - nu * L) < 1e-12, Fb
    assert abs(Ft[0] + nu * L) < 1e-12, Ft
    assert abs(Fb[1]) < 1e-12 and abs(Ft[1]) < 1e-12, (Fb, Ft)


def test_eval_p1_interpolates_linears_exactly():
    """Point evaluation reproduces an exactly-representable linear field."""
    mesh = meshmod.cylinder_channel_mesh(0)
    asm = NSAssembler(mesh, 0.001, dtype=jnp.float64)
    coords = asm.W.Q.dof_coords()
    vals = np.zeros(asm.n1)
    vals[:coords.shape[0]] = 2.0 * coords[:, 0] - 3.0 * coords[:, 1] + 1.0
    pts = [(0.15, 0.2), (0.25, 0.2), (1.0, 0.3), (2.1, 0.05)]
    got = eval_p1(asm, vals, pts)
    want = [2 * x - 3 * y + 1 for (x, y) in pts]
    assert np.abs(got - np.asarray(want)).max() < 1e-12


@pytest.mark.slow           # full f64 Newton solve at 21k dofs (~tens of min
                            # on the 1-CPU CI box; minutes on chip)
@pytest.mark.parametrize("ls", ["iterative"])
def test_dfg_2d1_benchmark_coefficients(ls):
    """Steady Re=20 solve reproduces the DFG 2D-1 coefficients to the
    level-0 discretization budget (see module docstring)."""
    level = 0
    hier = gmg.build_hierarchy(meshmod.cylinder_channel_mesh(0), level,
                               snap=meshmod.snap_to_circle)
    asm = NSAssembler(hier.fine, 0.001, dtype=jnp.float64)

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4.0 * 0.3 * x[:, 1] * (0.41 - x[:, 1]) / 0.41 ** 2
        return v

    noslip = [meshmod.WALL, meshmod.CYLINDER]
    bcs = [DirichletBC.velocity(asm.W, noslip,
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"pcd.variant": "BRM2", "dtype": "float64",
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "velocity.smoother": "minres",
            "pcd.ap.method": "gmg"}
    ap_h = gmg.PressureHierarchy(hier, jnp.float64,
                                 pcd_markers=[meshmod.OUTFLOW],
                                 fine_asm=asm)
    v_h = gmg.VelocityHierarchy(hier, 0.001, jnp.float64,
                                bc_markers=noslip + [meshmod.INFLOW],
                                fine_asm=asm)
    nl = NonlinearSolver(asm, bcs, overrides(SolverConfig(), over),
                         linearization="newton", ap_hierarchy=ap_h,
                         velocity_hierarchy=v_h)
    res = nl.solve(rtol=1e-8)
    assert res.converged

    # golden-parity (ADVICE r4: consume the cylinder golden_counts): the
    # scipy exact-LU oracle needs [41, 50, 50, 45] — GMG-inexact subsolves
    # may cost a bounded factor over that, never a blowup (the p-coarse
    # bottom level regression showed as 100-400 cap-saturated counts here)
    import json, os
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden_counts.json")) as f:
        golden = json.load(f)["cylinder/l0/BRM2/newton"]["linear_iters"]
    for ours, ref in zip(res.linear_iters, golden):
        assert ours <= 1.35 * ref + 2, (res.linear_iters, golden)

    n_u = 2 * asm.n2
    F = boundary_reaction(asm, res.w[:n_u], res.w[n_u:],
                          [meshmod.CYLINDER])
    cD, cL = 500.0 * F[0], 500.0 * F[1]      # 2 / (Ubar^2 D), Ubar=0.2
    p = eval_p1(asm, np.asarray(res.w[n_u:]), [(0.15, 0.2), (0.25, 0.2)])
    dP = p[0] - p[1]
    # reference intervals widened by the level-0 discretization budget
    assert 5.30 < cD < 5.85, cD
    assert -0.01 < cL < 0.04, cL
    assert 0.110 < dP < 0.125, dP
    # mass conservation at the converged state
    _, rp = asm.residual(res.w[:n_u], res.w[n_u:])
    assert float(jnp.max(jnp.abs(rp))) < 1e-9
