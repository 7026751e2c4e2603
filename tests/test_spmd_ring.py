"""Explicit-schedule SPMD path: ring-halo SpMV + fully-SPMD FGMRES.

The halo-exchange-optimized shard_map solve (SURVEY.md round-1 backlog):
remote reads per SpMV are one-hop ``ppermute`` halo slices instead of the
all-gather, validated for numeric parity against the single-device path on
the 8-device CPU mesh (the reference's ``mpirun -np 3`` analogue).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.parallel import spmd
from fenapack_tpu.solvers.krylov import fgmres


N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = meshmod.backward_step_mesh(1)
    # RCM ordering makes the sparsity one-hop under row-block partition;
    # row_align guarantees divisibility by the device count
    asm = NSAssembler(mesh, 0.02, dtype=jnp.float64, row_align=N_DEV,
                      reorder=True)
    dmesh = spmd.Mesh(np.array(jax.devices()[:N_DEV]), ("dd",))
    return asm, dmesh


def test_ring_spmv_matches_direct(setup):
    asm, dmesh = setup
    Ap = asm.const.Ap
    f = spmd.make_ring_spmv(Ap, dmesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(Ap.shape[1]))
    got = np.asarray(f(x))
    ref = np.asarray(Ap.mv(x))
    assert np.allclose(got, ref, atol=1e-12)


def test_ring_halo_is_narrow(setup):
    """The point of RCM + ring exchange: halo << block size."""
    asm, dmesh = setup
    rh = spmd.RingHaloELL(asm.const.Ap, N_DEV, "dd")
    assert rh.halo < 0.5 * rh.n_loc, (rh.halo, rh.n_loc)


def test_spmd_fgmres_matches_single_device(setup):
    asm, dmesh = setup
    Ap = asm.const.Ap
    n = Ap.shape[0]
    # pin the constant nullspace (Dirichlet row 0) AND the row_align
    # padding dofs (empty rows otherwise — singular operator)
    mask = (1.0 - asm.p_active).at[0].set(1.0)
    free = 1.0 - mask
    diag = jnp.where(mask > 0, 1.0, Ap.diag_from(asm.pat_p1.diag_pos))
    dinv = 1.0 / diag

    def mv(x):
        return free * Ap.mv(free * x) + mask * x

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n))
    ref = fgmres(mv, lambda r: dinv * r, b, maxiter=200, rtol=1e-8)

    # SPMD: same operator through the ring-halo local SpMV
    rh = spmd.RingHaloELL(Ap, N_DEV, "dd")
    rows = spmd.NamedSharding(dmesh, spmd.P("dd"))
    operands = jax.device_put(
        {"vals": Ap.vals, "cols": rh.cols_ext, "free": free,
         "mask": mask, "dinv": dinv}, rows)

    def make_ops(o):
        def matvec_local(x_loc):
            xf = o["free"] * x_loc
            y = rh.mv_local(o["vals"], o["cols"], xf)
            return o["free"] * y + o["mask"] * x_loc

        def pc_local(r_loc):
            return o["dinv"] * r_loc
        return matvec_local, pc_local

    x, iters, res = spmd.spmd_fgmres(dmesh, make_ops, operands,
                                     jax.device_put(b, rows),
                                     maxiter=200, rtol=1e-8)
    tr = float(jnp.linalg.norm(b - mv(x)) / jnp.linalg.norm(b))
    assert tr < 1e-7
    assert abs(int(iters) - int(ref.iters)) <= 2, (int(iters),
                                                   int(ref.iters))
