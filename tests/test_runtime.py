"""lift_jit: solver-state arrays become jit arguments (runtime.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from fenapack_tpu.runtime import collect_sites, lift_jit, Holder
from tests.test_solver import make_step_solver


def test_collect_sites_reaches_operator_state(monkeypatch):
    import fenapack_tpu.runtime as rt
    monkeypatch.setattr(rt, "LIFT_THRESHOLD_BYTES", 1024)
    nl = make_step_solver(0, "BRM2")
    sites = collect_sites((nl.oseen, nl.asm))
    names = {n for _, n in sites}
    # the big operator arrays must be discovered
    assert "vals" in names or "tiles" in names
    assert "entry_pos" in names
    assert "Jinv" in names or "wdet" in names
    # at the default threshold, the tiny level-0 problem lifts only the
    # dense velocity inverse
    big = collect_sites.__globals__  # noqa: F841 (readability)
    monkeypatch.setattr(rt, "LIFT_THRESHOLD_BYTES", 1 << 18)
    sites2 = collect_sites((nl.oseen, nl.asm))
    assert {n for _, n in sites2} == {"Ainv"}


def test_lifted_solve_matches_plain():
    nl = make_step_solver(0, "BRM2")
    w0 = nl.initial_state()
    F = nl._residual(w0)          # lifted residual
    res = nl.oseen.solve(w0[:nl.n_u], -F)   # lifted solve
    # plain (unlifted) reference
    plain = jax.jit(nl.oseen._solve_impl)
    res2 = plain(w0[:nl.n_u], -F)
    err = float(jnp.linalg.norm(res.x - res2.x) /
                jnp.linalg.norm(res2.x))
    assert err < 1e-12, err
    assert int(res.iters) == int(res2.iters)


def test_holder_reachable():
    h = Holder(A=jnp.ones((400, 400)))
    class Box:
        pass
    Box.__module__ = "fenapack_tpu.fake"
    b = Box()
    b.refs = [h]
    sites = collect_sites((b,))
    assert any(n == "A" for _, n in sites)


def test_lift_restores_attributes():
    nl = make_step_solver(0, "BRM2")
    before = nl.asm.wdet
    _ = nl._residual(nl.initial_state())
    assert nl.asm.wdet is before      # swap-in is trace-local
