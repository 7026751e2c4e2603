"""Golden-operator tests: JAX batched assembly vs the loop-based scipy oracle.

SURVEY.md section 4 rebuild test plan, item 1: entrywise comparison on small
meshes, plus hand-computable single-element anchors.
"""
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.ops.sparse import ELL

from tests.reference_fem.oracle import OracleOperators
from tests.reference_fem.driver import marked_facet_edges


def _dense(A):
    return np.asarray(A.todense())


@pytest.fixture(scope="module")
def setup():
    mesh = meshmod.backward_step_mesh(level=0)
    nu = 0.02
    oracle = OracleOperators(mesh, nu)
    asm = NSAssembler(mesh, nu, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    wind = rng.standard_normal(2 * asm.n2)
    return mesh, oracle, asm, wind


def test_viscous_block(setup):
    mesh, oracle, asm, _ = setup
    L = asm.pat_p2.to_scipy(asm.const.L)
    assert np.allclose(_dense(L), _dense(oracle.L_scalar), atol=1e-12)


def test_divergence(setup):
    mesh, oracle, asm, _ = setup
    Dx = asm.pat_div.to_scipy(asm.const.Dx)
    Dy = asm.pat_div.to_scipy(asm.const.Dy)
    D = sp.hstack([Dx, Dy])
    assert np.allclose(_dense(D), _dense(oracle.D), atol=1e-12)
    # transposes consistent
    DxT = asm.pat_divT.to_scipy(asm.const.DxT)
    assert np.allclose(_dense(DxT), _dense(Dx.T), atol=1e-14)


def test_pressure_mass_stiffness(setup):
    mesh, oracle, asm, _ = setup
    Mp = asm.pat_p1.to_scipy(asm.const.Mp)
    Ap = asm.pat_p1.to_scipy(asm.const.Ap)
    assert np.allclose(_dense(Mp), _dense(oracle.Mp), atol=1e-12)
    assert np.allclose(_dense(Ap), _dense(oracle.Ap), atol=1e-12)
    # mass matrix of (1/nu) p q dx sums to area/nu
    area = (1.0 + 2.0 * 5.0)  # step domain: 1x1 inlet + 6x... = 1 + 10
    assert np.isclose(Mp.sum(), area / oracle.nu, rtol=1e-12)


def test_convection(setup):
    mesh, oracle, asm, wind = setup
    N = asm.pat_p2.to_scipy(
        ELL(asm.pat_p2.cols, asm.convection_values(jnp.asarray(wind)), asm.n2))
    assert np.allclose(_dense(N), _dense(oracle.convection(wind)), atol=1e-11)


def test_kp(setup):
    mesh, oracle, asm, wind = setup
    Kp = asm.pat_p1.to_scipy(
        ELL(asm.pat_p1.cols, asm.kp_values(jnp.asarray(wind)), asm.n1))
    assert np.allclose(_dense(Kp), _dense(oracle.kp(wind)), atol=1e-11)


def test_kp_surface(setup):
    mesh, oracle, asm, wind = setup
    inflow = marked_facet_edges(mesh, meshmod.INFLOW)
    Kp_s = asm.pat_p1.to_scipy(
        ELL(asm.pat_p1.cols, asm.kp_values(jnp.asarray(wind), surface=True),
            asm.n1))
    ref = oracle.kp(wind, inflow_facets=inflow)
    assert np.allclose(_dense(Kp_s), _dense(ref), atol=1e-11)


def test_newton_reaction(setup):
    mesh, oracle, asm, wind = setup
    R = asm.newton_reaction_values(jnp.asarray(wind))
    n2 = asm.n2
    blocks = [[asm.pat_p2.to_scipy(ELL(asm.pat_p2.cols, R[a, b], n2))
               for b in range(2)] for a in range(2)]
    Rfull = sp.bmat(blocks)
    assert np.allclose(_dense(Rfull), _dense(oracle.newton_reaction(wind)),
                       atol=1e-11)


def test_residual_matches_oracle(setup):
    mesh, oracle, asm, wind = setup
    rng = np.random.default_rng(1)
    w = rng.standard_normal(2 * asm.n2 + asm.n1)
    u, p = jnp.asarray(w[:2 * asm.n2]), jnp.asarray(w[2 * asm.n2:])
    ru, rp = asm.residual(u, p)
    ref = oracle.residual(w)
    assert np.allclose(np.concatenate([np.asarray(ru), np.asarray(rp)]), ref,
                       atol=1e-10)


def test_single_triangle_anchors():
    """Hand-computed values on one unit right triangle."""
    verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2]])
    from fenapack_tpu.fem.mesh import _build_topology
    mesh = _build_topology(verts, cells)
    asm = NSAssembler(mesh, nu=1.0, dtype=jnp.float64)
    Mp = _dense(asm.pat_p1.to_scipy(asm.const.Mp))
    # P1 mass on triangle area 1/2: diag = area/6, offdiag = area/12
    assert np.allclose(Mp, (0.5 / 12) * (np.eye(3) + 1.0), atol=1e-14)
    Ap = _dense(asm.pat_p1.to_scipy(asm.const.Ap))
    ref = 0.5 * np.array([[2, -1, -1], [-1, 1, 0], [-1, 0, 1]])
    assert np.allclose(Ap, ref, atol=1e-14)
    # viscous P2 row sums vanish (constants in kernel)
    L = _dense(asm.pat_p2.to_scipy(asm.const.L))
    assert np.allclose(L.sum(axis=1), 0.0, atol=1e-13)
    assert np.allclose(L, L.T, atol=1e-14)
