"""GCRO-DR recycling FGMRES (solvers.krylov.fgmres_dr): f64 correctness.

The recycle space deflates the slowest Krylov directions across solves with
the same/nearby operator.  In f64 this is a strict win; at f32 the
``C = A U`` invariant error stalls the TRUE residual (measured on the TPU
bench), so the production IR path keeps it opt-in (config.krylov.recycle).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.solvers.krylov import (fgmres, fgmres_dr, empty_recycle,
                                         refresh_recycle)


@pytest.fixture(scope="module")
def operator():
    """Jacobi-preconditioned pressure Laplacian (SPD, slow enough under
    plain GMRES that deflation has room to help)."""
    mesh = meshmod.backward_step_mesh(1)
    asm = NSAssembler(mesh, 0.02, dtype=jnp.float64)
    Ap = asm.const.Ap
    diag = Ap.diag_from(asm.pat_p1.diag_pos)
    # pin the constant nullspace with one Dirichlet row
    mask = jnp.zeros(Ap.shape[0]).at[0].set(1.0)
    free = 1.0 - mask

    def mv(x):
        return free * Ap.mv(free * x) + mask * x
    dinv = 1.0 / jnp.where(mask > 0, 1.0, diag)
    return mv, (lambda r: dinv * r), Ap.shape[0]


def test_fgmres_dr_first_solve_matches_plain(operator):
    mv, pc, n = operator
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(n))
    res0 = fgmres(mv, pc, b, maxiter=400, rtol=1e-10)
    rec = empty_recycle(12, n, jnp.float64)
    res1, rec1 = fgmres_dr(mv, pc, b, rec, maxiter=400, rtol=1e-10)
    # invalid recycle space => identical iteration path
    assert int(res1.iters) == int(res0.iters)
    tr = float(jnp.linalg.norm(b - mv(res1.x)) / jnp.linalg.norm(b))
    assert tr < 1e-9
    assert np.all(np.asarray(rec1.valid) == 1.0)
    # invariants of the harvested space
    C, U = np.asarray(rec1.C), np.asarray(rec1.U)
    assert np.abs(C @ C.T - np.eye(12)).max() < 1e-10
    AU = np.stack([np.asarray(mv(jnp.asarray(u))) for u in U])
    assert np.abs(AU - C).max() < 1e-8


def test_fgmres_dr_recycling_cuts_iterations(operator):
    mv, pc, n = operator
    rng = np.random.default_rng(3)
    b1 = jnp.asarray(rng.standard_normal(n))
    b2 = jnp.asarray(rng.standard_normal(n))
    rec = empty_recycle(12, n, jnp.float64)
    res1, rec = fgmres_dr(mv, pc, b1, rec, maxiter=400, rtol=1e-8)
    res2, _ = fgmres_dr(mv, pc, b2, rec, maxiter=400, rtol=1e-8)
    plain = fgmres(mv, pc, b2, maxiter=400, rtol=1e-8)
    tr = float(jnp.linalg.norm(b2 - mv(res2.x)) / jnp.linalg.norm(b2))
    assert tr < 3e-8
    assert int(res2.iters) < int(plain.iters), (int(res2.iters),
                                                int(plain.iters))


def test_partial_bootstrap_from_short_solves(operator):
    """Solves shorter than the recycle dimension must still fill the space
    INCREMENTALLY (per-column validity) — the IR production path runs
    rounds of ~5-10 iterations, where an all-or-nothing flag never
    bootstraps.  Invalid rows stay exactly zero (the consumers rely on it),
    and the space must eventually cut iterations like a full harvest."""
    mv, pc, n = operator
    rng = np.random.default_rng(5)
    rec = empty_recycle(12, n, jnp.float64)
    b = jnp.asarray(rng.standard_normal(n))
    res, rec = fgmres_dr(mv, pc, b, rec, maxiter=8, rtol=1e-14)
    nv1 = int(np.asarray(rec.valid).sum())
    assert 0 < nv1 <= 8, nv1
    U = np.asarray(rec.U)
    assert np.all(U[np.asarray(rec.valid) == 0.0] == 0.0)
    assert np.abs(np.asarray(rec.C @ rec.C.T)
                  - np.diag(np.asarray(rec.valid))).max() < 1e-10
    # a second short solve grows the space
    res, rec = fgmres_dr(mv, pc, b - mv(res.x), rec, maxiter=8, rtol=1e-14)
    nv2 = int(np.asarray(rec.valid).sum())
    assert nv2 > nv1, (nv1, nv2)
    # ... and the partially-filled space already helps on a fresh rhs
    b2 = jnp.asarray(rng.standard_normal(n))
    res2, _ = fgmres_dr(mv, pc, b2, rec, maxiter=400, rtol=1e-8)
    plain = fgmres(mv, pc, b2, maxiter=400, rtol=1e-8)
    tr = float(jnp.linalg.norm(b2 - mv(res2.x)) / jnp.linalg.norm(b2))
    assert tr < 3e-8
    assert int(res2.iters) < int(plain.iters), (int(res2.iters),
                                                int(plain.iters))


def test_refresh_recycle_tracks_operator_change(operator):
    mv, pc, n = operator
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(n))
    rec = empty_recycle(12, n, jnp.float64)
    _, rec = fgmres_dr(mv, pc, b, rec, maxiter=400, rtol=1e-8)
    # perturbed operator (shifted diagonal)
    mv2 = lambda x: mv(x) + 0.05 * x
    rec2 = refresh_recycle(mv2, rec)
    C, U = np.asarray(rec2.C), np.asarray(rec2.U)
    assert np.abs(C @ C.T - np.eye(12)).max() < 1e-10
    AU = np.stack([np.asarray(mv2(jnp.asarray(u))) for u in U])
    assert np.abs(AU - C).max() < 1e-8
    res, _ = fgmres_dr(mv2, pc, b, rec2, maxiter=400, rtol=1e-8)
    tr = float(jnp.linalg.norm(b - mv2(res.x)) / jnp.linalg.norm(b))
    assert tr < 3e-8
