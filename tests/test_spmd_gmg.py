"""Sharded (shard_map) pressure GMG vs the single-device V-cycle.

Runs on the virtual 8-device CPU mesh (conftest).  The SPMD V-cycle is the
same math modulo per-level RCM relabeling (permutation-equivariant), so the
two solves must agree to reduction-order roundoff, and the V-cycle must
contract the Laplacian residual.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.solvers import gmg
from fenapack_tpu.solvers.config import SubsolveConfig
from fenapack_tpu.parallel.spmd_gmg import SPMDPressureGMG


@pytest.fixture(scope="module")
def setup():
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), 2)
    ph = gmg.PressureHierarchy(hier, jnp.float64,
                               pcd_markers=[meshmod.OUTFLOW])
    dmesh = Mesh(np.array(jax.devices("cpu")[:8]), ("dd",))
    sp = SPMDPressureGMG(ph, dmesh, dtype=jnp.float64, smooth_iters=2,
                         cycles=1)
    return hier, ph, sp


def test_spmd_vcycle_matches_single_device(setup):
    hier, ph, sp = setup
    cfg = SubsolveConfig(method="gmg", smooth_iters=2, cycles=1)
    asm_f, Ap_f, mask_f = ph.levels[-1]
    single = gmg.make_gmg_solver(ph, cfg, jnp.float64, bc_mask=mask_f)

    n1 = asm_f.n1_real
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n1)
    b_nat = jnp.asarray(b)

    x_single = np.asarray(single(b_nat))[:n1]

    # permute into the SPMD fine ordering (+ padding)
    rank = sp.fine_rank
    n_pad = sp.levels[-1].n_pad
    b_sp = np.zeros(n_pad)
    b_sp[rank] = b
    x_sp_perm = np.asarray(sp.make_solver()(jnp.asarray(b_sp)))
    x_sp = x_sp_perm[rank]              # back to natural ordering

    assert np.allclose(x_sp, x_single, rtol=1e-10, atol=1e-12)


def test_spmd_vcycle_contracts_residual(setup):
    hier, ph, sp = setup
    asm_f, Ap_f, mask_f = ph.levels[-1]
    n1 = asm_f.n1_real
    rank = sp.fine_rank
    n_pad = sp.levels[-1].n_pad

    free = 1.0 - np.asarray(mask_f)[:n1]
    A = np.asarray(asm_f.pat_p1.to_dense(Ap_f.vals))[:n1, :n1]
    A = free[:, None] * A * free[None, :] + np.diag(1.0 - free)

    rng = np.random.default_rng(1)
    b = rng.standard_normal(n1) * free
    b_sp = np.zeros(n_pad)
    b_sp[rank] = b
    solver = sp.make_solver()

    x = np.zeros(n1)
    r = b.copy()
    norms = [np.linalg.norm(r)]
    for _ in range(3):
        r_sp = np.zeros(n_pad)
        r_sp[rank] = r
        e = np.asarray(solver(jnp.asarray(r_sp)))[rank]
        x = x + e
        r = b - A @ x
        norms.append(np.linalg.norm(r))
    # >= 5x contraction per V-cycle on the Laplacian
    assert norms[3] < norms[0] * (1 / 5) ** 3


def test_ring_halo_used_on_every_level(setup):
    """The per-level RCM relabeling must make every level one-hop."""
    _, _, sp = setup
    for lv in sp.levels:
        assert lv.ring.halo <= lv.ring.n_loc
