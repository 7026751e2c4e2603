"""Checkpoint/resume, VTK export, config overrides, batched solves."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from fenapack_tpu.solvers.config import SolverConfig, override, overrides
from fenapack_tpu.utils.io import save_checkpoint, load_checkpoint, save_vtk
from tests.test_solver import make_step_solver


def test_config_overrides():
    cfg = SolverConfig()
    cfg = override(cfg, "pcd.ap.iters", 20)
    assert cfg.pcd.ap.iters == 20
    cfg = overrides(cfg, {"krylov.rtol": 1e-4, "pcd.variant": "BRM1",
                          "velocity.method": "gmg"})
    assert cfg.krylov.rtol == 1e-4
    assert cfg.pcd.variant == "BRM1"
    assert cfg.velocity.method == "gmg"
    assert cfg.pcd.ap.iters == 20          # earlier override survives


def test_checkpoint_roundtrip(tmp_path):
    w = jnp.arange(10.0)
    p = str(tmp_path / "state.npz")
    save_checkpoint(p, w, t=1.5, meta={"nu": 0.02})
    w2, t, meta = load_checkpoint(p)
    assert np.allclose(w2, np.arange(10.0))
    assert t == 1.5 and meta["nu"] == 0.02


def test_vtk_export(tmp_path):
    nl = make_step_solver(0, "BRM2")
    w = nl.initial_state()
    p = str(tmp_path / "sol.vtk")
    save_vtk(p, nl.asm, w)
    txt = open(p).read()
    assert "VECTORS velocity" in txt and "SCALARS pressure" in txt
    assert txt.count("\n") > nl.asm.mesh.num_vertices


def test_batched_rhs_solve():
    """Batch-of-problems parallelism (SURVEY.md section 2.3): the whole
    Oseen solve vmaps over a batch of right-hand sides — a capability the
    MPI reference cannot express."""
    nl = make_step_solver(0, "BRM2")
    w0 = nl.initial_state()
    wind = w0[:nl.n_u]
    F = nl._residual(w0)
    rng = np.random.default_rng(0)
    B = jnp.stack([-F, -F * 0.5,
                   jnp.asarray(rng.standard_normal(nl.n)) * 1e-2])
    batched = jax.vmap(lambda b: nl.oseen._solve_impl(wind, b).x)
    X = batched(B)
    single = nl.oseen.solve(wind, B[2])
    err = float(jnp.linalg.norm(X[2] - single.x) / jnp.linalg.norm(single.x))
    assert err < 1e-8, err
