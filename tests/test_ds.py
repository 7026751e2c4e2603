"""Double-single (two-f32) arithmetic accuracy (ops/ds.py).

Reference oracle: numpy longdouble (80-bit on x86) — ds results must sit far
below f32 (~6e-8) and near the ~2^-45 compensated-arithmetic level, i.e. well
inside what the hi-Krylov residual estimate needs (honest to 1e-8 relative).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.ops import ds


RNG = np.random.default_rng(42)


def _rand(n, scale=1.0):
    # f64 values with nontrivial lo parts
    return (RNG.standard_normal(n) * scale).astype(np.float64)


def test_from_to_roundtrip():
    x = _rand(1000)
    d = ds.from_f64(jnp.asarray(x))
    back = np.asarray(ds.to_f64(d))
    # hi+lo represents f64 to ~2^-48 relative
    assert np.max(np.abs(back - x) / np.abs(x)) < 1e-13


def test_add_mul_accuracy():
    x = _rand(4096)
    y = _rand(4096)
    dx, dy = ds.from_f64(jnp.asarray(x)), ds.from_f64(jnp.asarray(y))
    ref_add = np.asarray(x, np.longdouble) + np.asarray(y, np.longdouble)
    ref_mul = np.asarray(x, np.longdouble) * np.asarray(y, np.longdouble)
    got_add = np.asarray(ds.to_f64(ds.add(dx, dy)), np.longdouble)
    got_mul = np.asarray(ds.to_f64(ds.mul(dx, dy)), np.longdouble)
    # error is ~2^-48 of the OPERAND scale (cancellation makes result-
    # relative error unbounded for any finite-precision format)
    scale = np.abs(x) + np.abs(y)
    assert float(np.max(np.abs(got_add - ref_add) / scale)) < 1e-13
    assert float(np.max(np.abs(got_mul - ref_mul)
                        / np.maximum(np.abs(ref_mul), 1e-30))) < 1e-12


@pytest.mark.parametrize("n", [1, 7, 128, 26624])
def test_tree_sum_vs_longdouble(n):
    x = _rand(n)
    ref = float(np.sum(np.asarray(x, np.longdouble)))
    got = float(ds.to_f64(ds.tree_sum(ds.from_f64(jnp.asarray(x)))))
    scale = float(np.sum(np.abs(x))) + 1e-30
    assert abs(got - ref) / scale < 1e-12


def test_dot_cancellation():
    # adversarial: large cancellation in the dot product
    n = 8192
    x = _rand(n, scale=1e4)
    y = np.empty(n)
    y[: n // 2] = x[n // 2:]
    y[n // 2:] = -x[: n // 2]
    xx = x
    # <x, y> = x1.x2 - x2.x1 == 0 exactly in exact arithmetic
    d = ds.dot(ds.from_f64(jnp.asarray(xx)), ds.from_f64(jnp.asarray(y)))
    got = float(ds.to_f64(d))
    scale = float(np.dot(np.abs(xx), np.abs(y)))
    assert abs(got) / scale < 1e-12


def test_mat_dots_and_update():
    m, n = 33, 5000
    V = _rand((m, n))
    w = _rand(n)
    dV, dw = ds.from_f64(jnp.asarray(V)), ds.from_f64(jnp.asarray(w))
    h = ds.mat_dots(dV, dw)
    ref_h = (np.asarray(V, np.longdouble) @ np.asarray(w, np.longdouble))
    got_h = np.asarray(ds.to_f64(h), np.longdouble)
    den = np.abs(np.asarray(V, np.longdouble)) @ np.abs(
        np.asarray(w, np.longdouble)) + 1e-30
    assert float(np.max(np.abs(got_h - ref_h) / den)) < 1e-12

    w2 = ds.update(dw, dV, h)
    ref_w2 = (np.asarray(w, np.longdouble)
              - np.asarray(V, np.longdouble).T @ got_h)
    got_w2 = np.asarray(ds.to_f64(w2), np.longdouble)
    scale = float(np.max(np.abs(ref_w2))) + float(np.max(np.abs(w)))
    assert float(np.max(np.abs(got_w2 - ref_w2))) / scale < 1e-12


def test_norm():
    x = _rand(10000)
    got = float(ds.norm(ds.from_f64(jnp.asarray(x))))
    ref = float(np.sqrt(np.sum(np.square(np.asarray(x, np.longdouble)))))
    assert abs(got - ref) / ref < 1e-12


def test_fgmres_ds_unit():
    """fgmres_ds solves a small nonsymmetric system to deep tolerance with
    iteration counts matching the all-f64 fgmres (honest estimate)."""
    from fenapack_tpu.solvers.krylov import fgmres, fgmres_ds

    rng = np.random.default_rng(3)
    n = 80
    A = np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    A64 = jnp.asarray(A)
    A32 = jnp.asarray(A.astype(np.float32))
    dinv32 = jnp.asarray((1.0 / np.diag(A)).astype(np.float32))
    dinv64 = jnp.asarray(1.0 / np.diag(A))

    res64 = fgmres(lambda x: A64 @ x, lambda r: dinv64 * r, jnp.asarray(b),
                   maxiter=n, rtol=1e-10)
    res_ds = fgmres_ds(lambda x: A64 @ x, lambda r: dinv32 * r,
                       jnp.asarray(b), maxiter=n, rtol=1e-10)
    assert res_ds.converged
    x = np.asarray(res_ds.x)
    relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert relres < 5e-10, relres
    # same-quality estimate => comparable counts (flexible PC in f32 can
    # shift the path by an iteration or two)
    assert abs(int(res_ds.iters) - int(res64.iters)) <= 3, (
        int(res_ds.iters), int(res64.iters))


def test_hi_krylov_ds_parity():
    """hi_krylov with ds_basis matches the f64-basis path: converged true
    residual and per-step iteration counts within a couple iterations."""
    from tests.test_solver import make_step_solver

    counts = {}
    for ds_on in (False, True):
        nl = make_step_solver(0, "BRM2", **{
            "dtype": "float32", "krylov.rtol": 2e-6, "krylov.maxiter": 80,
            "krylov.hi_krylov": True, "krylov.ds_basis": ds_on})
        ir = nl.oseen.make_ir_solve(rtol=1e-8)
        w = nl.initial_state().astype(jnp.float64)
        F = nl._residual(w)
        b = -jnp.asarray(np.asarray(F), dtype=jnp.float64)
        wind = w[: nl.n_u].astype(jnp.float32)
        x, iters, rn = ir(wind, b)
        bn = float(jnp.linalg.norm(b))
        assert float(rn) <= 1.5e-8 * bn, (ds_on, float(rn) / bn)
        counts[ds_on] = int(iters)
    assert abs(counts[True] - counts[False]) <= 3, counts


def test_scale_and_dynamic_row():
    x = _rand(100)
    d = ds.scale(ds.from_f64(jnp.asarray(x)), jnp.float32(3.0))
    ref = np.asarray(x, np.longdouble) * 3.0
    got = np.asarray(ds.to_f64(d), np.longdouble)
    assert float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref),
                                                       1e-30))) < 1e-11

    V = ds.from_f64(jnp.asarray(_rand((4, 100))))
    row = ds.from_f64(jnp.asarray(x))
    V2 = ds.dynamic_set_row(V, 2, row)
    assert np.allclose(np.asarray(ds.to_f64(V2))[2], x, rtol=0, atol=1e-13)
