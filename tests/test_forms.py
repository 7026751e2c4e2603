"""Custom-form compiler golden tests: rebuild the built-in NS/PCD operators
from user-written forms (fem.forms) and compare entrywise against the
factored NSAssembler values.

This is the parity test for the reference's arbitrary-UFL-form capability
(``fenapack/assembling.py::PCDAssembler`` accepts any forms; SURVEY.md
section 7.4 last item): if the generic compiler reproduces every built-in
operator including the BRM2 kp facet term and the full mixed Jacobian, a
user-supplied variant form assembles through the same verified paths.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem import forms as F


NU = 0.02


@pytest.fixture(scope="module")
def setup():
    mesh = meshmod.backward_step_mesh(level=0)
    asm = NSAssembler(mesh, NU, dtype=jnp.float64)
    fc = F.FormCompiler(asm.W, quad_degree=5)
    rng = np.random.default_rng(3)
    w = np.zeros(asm.W.dim)
    w[:2 * asm.n2] = rng.standard_normal(2 * asm.n2)
    w[2 * asm.n2:] = rng.standard_normal(asm.n1)
    return mesh, asm, fc, jnp.asarray(w)


def _scipy(pat, vals):
    return np.asarray(pat.to_scipy(pat.matrix(vals)).todense())


def test_mp_form(setup):
    mesh, asm, fc, w = setup
    p = F.TrialFunction(asm.W)
    q = F.TestFunction(asm.W)
    vals = fc.assemble_block((1.0 / NU) * p * q * F.dx, "p", "p")
    got = _scipy(fc.pattern("p", "p"), vals)
    ref = np.asarray(asm.pat_p1.to_scipy(asm.const.Mp).todense())
    assert np.allclose(got, ref, atol=1e-12)


def test_ap_form(setup):
    mesh, asm, fc, w = setup
    p = F.TrialFunction(asm.W)
    q = F.TestFunction(asm.W)
    vals = fc.assemble_block(
        F.inner(F.grad(p), F.grad(q)) * F.dx, "p", "p")
    got = _scipy(fc.pattern("p", "p"), vals)
    ref = np.asarray(asm.pat_p1.to_scipy(asm.const.Ap).todense())
    assert np.allclose(got, ref, atol=1e-12)


def test_kp_form_with_brm2_surface(setup):
    mesh, asm, fc, w = setup
    p = F.TrialFunction(asm.W)
    q = F.TestFunction(asm.W)
    wc = F.Coefficient(asm.W, "w")
    u_, p_ = F.split(wc)
    n = F.FacetNormal(mesh)
    kp = ((1.0 / NU) * F.dot(F.grad(p), u_) * q * F.dx
          - (1.0 / NU) * F.dot(u_, n) * p * q * F.ds(meshmod.INFLOW))
    vals = fc.assemble_block(kp, "p", "p", coeffs={"w": w})
    got = _scipy(fc.pattern("p", "p"), vals)
    ref_vals = asm.kp_values(w[:2 * asm.n2], surface=True)
    ref = np.asarray(asm.pat_p1.to_scipy(
        asm.pat_p1.matrix(ref_vals)).todense())
    assert np.allclose(got, ref, atol=1e-12)


def test_mixed_jacobian_blocks(setup):
    """Full Picard (Oseen) mixed form: uu block == nu*L + N(w) per
    component, up/pu blocks == gradient/divergence."""
    mesh, asm, fc, w = setup
    n2, n1 = asm.n2, asm.n1
    (u, p) = F.TrialFunctions(asm.W)
    (v, q) = F.TestFunctions(asm.W)
    wc = F.Coefficient(asm.W, "w")
    u_, _ = F.split(wc)
    J = (NU * F.inner(F.grad(u), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u), u_), v) * F.dx
         - p * F.div(v) * F.dx
         - q * F.div(u) * F.dx)
    coeffs = {"w": w}

    # uu block: block-diagonal with the scalar A1 = nu L + N
    vals_uu = fc.assemble_block(J, "u", "u", coeffs=coeffs)
    got = _scipy(fc.pattern("u", "u"), vals_uu)
    A1 = asm.pat_p2.to_scipy(asm.pat_p2.matrix(
        asm.picard_matrix_values(w[:2 * n2]))).todense()
    ref = np.zeros((2 * n2, 2 * n2))
    ref[:n2, :n2] = A1
    ref[n2:, n2:] = A1
    assert np.allclose(got, np.asarray(ref), atol=1e-11)

    # up block (pressure gradient): == stacked DT_a
    vals_up = fc.assemble_block(J, "u", "p", coeffs=coeffs)
    got = _scipy(fc.pattern("u", "p"), vals_up)
    DT = [np.asarray(asm.pat_divT.to_scipy(asm.const.DT[a]).todense())
          for a in range(2)]
    ref = np.concatenate(DT, axis=0)
    assert np.allclose(got, ref, atol=1e-12)

    # pu block (divergence): == [D_x, D_y]
    vals_pu = fc.assemble_block(J, "p", "u", coeffs=coeffs)
    got = _scipy(fc.pattern("p", "u"), vals_pu)
    D = [np.asarray(asm.pat_div.to_scipy(asm.const.D[a]).todense())
         for a in range(2)]
    ref = np.concatenate(D, axis=1)
    assert np.allclose(got, ref, atol=1e-12)


def test_residual_linear_form(setup):
    """Nonlinear residual as a linear form F(w; v,q) matches the
    assembler's factored residual."""
    mesh, asm, fc, w = setup
    n2 = asm.n2
    (v, q) = F.TestFunctions(asm.W)
    wc = F.Coefficient(asm.W, "w")
    u_, p_ = F.split(wc)
    Fform = (NU * F.inner(F.grad(u_), F.grad(v)) * F.dx
             + F.inner(F.dot(F.grad(u_), u_), v) * F.dx
             - p_ * F.div(v) * F.dx
             - q * F.div(u_) * F.dx)
    ru = fc.assemble_vector(Fform, "u", coeffs={"w": w})
    rp = fc.assemble_vector(Fform, "p", coeffs={"w": w})
    ru_ref, rp_ref = asm.residual(w[:2 * n2], w[2 * n2:])
    assert np.allclose(np.asarray(ru), np.asarray(ru_ref), atol=1e-11)
    assert np.allclose(np.asarray(rp), np.asarray(rp_ref), atol=1e-11)


def test_newton_reaction_via_forms(setup):
    """Newton extra term inner(grad(w) u, v) reproduces the factored
    newton_reaction_values blocks."""
    mesh, asm, fc, w = setup
    n2 = asm.n2
    (u, p) = F.TrialFunctions(asm.W)
    (v, q) = F.TestFunctions(asm.W)
    wc = F.Coefficient(asm.W, "w")
    u_, _ = F.split(wc)
    Jr = F.inner(F.dot(F.grad(u_), u), v) * F.dx
    vals = fc.assemble_block(Jr, "u", "u", coeffs={"w": w})
    got = _scipy(fc.pattern("u", "u"), vals)
    R = asm.newton_reaction_values(w[:2 * n2])
    ref = np.zeros((2 * n2, 2 * n2))
    for a in range(2):
        for b in range(2):
            ref[a * n2:(a + 1) * n2, b * n2:(b + 1) * n2] = np.asarray(
                asm.pat_p2.to_scipy(asm.pat_p2.matrix(R[a, b])).todense())
    assert np.allclose(got, ref, atol=1e-11)
