"""The models package: every canonical problem builds and solves."""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.models import (StepFlow2D, LidDrivenCavity, Channel2D,
                                 ObstacleChannel2D, StepFlow3D, Duct3D)


def test_step2d_solver_and_gmg():
    nl = StepFlow2D(level=1).solver(gmg_subsolves=True,
                                    **{"krylov.maxiter": 150})
    res = nl.solve(rtol=1e-3, max_steps=10)
    assert res.nonlinear_res[-1] < 1e-3 * res.nonlinear_res[0]


def test_cavity_enclosed():
    nl = LidDrivenCavity(nu=0.02).solver(pcd="BRM2")   # Re=50: undamped OK
    assert nl.enclosed
    res = nl.solve(rtol=1e-3, max_steps=8)
    assert res.nonlinear_res[-1] < 1e-3 * res.nonlinear_res[0]


def test_channel_unsteady():
    us = Channel2D().solver(unsteady=0.25)
    w, iters, rn = us.step(us.initial_state(), picard_iters=2)
    assert iters > 0 and np.isfinite(rn)


def test_obstacle_builds():
    nl = ObstacleChannel2D().solver()
    res = nl.solve(rtol=1e-2, max_steps=3)
    assert res.nonlinear_res[-1] < res.nonlinear_res[0]


@pytest.mark.parametrize("cls", [Duct3D])
def test_3d_problem(cls):
    nl = cls().solver(**{"krylov.maxiter": 200})
    res = nl.solve(rtol=1e-3, max_steps=5)
    assert res.nonlinear_res[-1] < 1e-3 * res.nonlinear_res[0]
