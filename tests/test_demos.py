"""Demo smoke tests — the demos ARE the integration tests (SURVEY.md
section 4: the reference runs its demo scripts at low refinement in CI)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", FENAPACK_PLATFORM="cpu",
           JAX_CACHE_DIR="/tmp/jax_cache_demo")


def run_demo(args, timeout=420):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "demos", args[0]), *args[1:]],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=ROOT)


def test_demo_step2d_direct():
    r = run_demo(["demo_navier_stokes_pcd.py", "-l", "0", "--rtol", "1e-3",
                  "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converged: True" in r.stdout


def test_demo_cavity():
    r = run_demo(["demo_cavity.py", "-l", "0", "--Re", "50",
                  "--rtol", "1e-3", "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converged: True" in r.stdout


def test_demo_unsteady():
    r = run_demo(["demo_unsteady_channel.py", "-l", "0", "--dt", "0.5",
                  "--t-end", "1.0", "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wall:" in r.stdout


def test_demo_step3d():
    r = run_demo(["demo_step3d.py", "-l", "0", "--rtol", "1e-2",
                  "--dtype", "float64", "--velocity", "lu",
                  "--maxiter", "100"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converged: True" in r.stdout


def test_demo_spmd():
    r = run_demo(["demo_spmd.py", "-l", "0", "-n", "8", "--path", "ring"],
                 timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[ring]" in r.stdout


def test_demo_custom_forms():
    r = run_demo(["demo_custom_forms.py", "-l", "0", "--rtol", "1e-3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converged: True" in r.stdout
